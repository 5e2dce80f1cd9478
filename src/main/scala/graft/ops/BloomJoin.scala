package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter join pruning — the explicit form of the runtime row-level
  * filtering Spark injects for shuffle joins (Catalyst's
  * `InjectRuntimeFilter`, reused here as a first-class operator the caller
  * controls): build a bloom filter over the build side's join keys, cut
  * the probe side down with a `might_contain` scan predicate, then
  * exact-verify with a real semi join.
  *
  * Why this matters at 100 TB: a big-big semi join shuffles BOTH sides on
  * the key. The bloom filter is a few MB regardless of data size
  * (broadcast as a 1-row frame, never collected to the driver in the
  * plan), and the `might_contain` predicate runs scan-side — so the
  * fact-table shuffle carries only rows that can possibly match. With a
  * 1% match rate the exchange shrinks ~100×, at the price of one narrow
  * aggregation over the (much smaller) build side.
  *
  * Exactness: bloom filters have no false negatives, and the trailing
  * semi join removes false positives — so the composition is row-for-row
  * identical to the plain semi join (gated as such by q124).
  *
  * Built on Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (public Catalyst classes, not SQL-registered upstream); both are
  * exposed to SQL as `bloom_agg` / `bloom_might_contain` via
  * [[graft.GraftExtensions]].
  */
object BloomJoin {

  private def e(c: Column) = GraftColumnBridge.expression(c)

  /** Aggregate: bloom filter (as binary) over xxhash64 of `key`. */
  def bloom_agg(key: Column, expectedItems: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(new XxHash64(Seq(e(key))), expectedItems)
        .toAggregateExpression())

  /** Predicate: might `key` be in the bloom filter built by [[bloom_agg]]?
    * False ⇒ definitely absent; true ⇒ verify exactly.
    */
  def bloom_might_contain(bloom: Column, key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(e(bloom), new XxHash64(Seq(e(key)))))

  /** The bloom filter of `dim.dimKey` as a SCALAR SUBQUERY column —
    * `might_contain` requires a constant or scalar subquery bloom input
    * (DATATYPE_MISMATCH.BLOOM_FILTER_BINARY_OP_WRONG_TYPE otherwise), and
    * a subquery is exactly how Catalyst's own InjectRuntimeFilter wires
    * it: the aggregation runs as its own stage and the (MB-scale) result
    * is shipped to every probe task, never through a row join.
    */
  private def bloomSubquery(dim: DataFrame, dimKey: String,
                            expectedItems: Long): Column = {
    val agg = dim.agg(bloom_agg(col(dimKey), expectedItems).as("__bf"))
    GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        GraftColumnBridge.analyzedPlan(agg)))
  }

  /** Bloom-pruned exact LEFT SEMI join: keep `fact` rows whose `factKey`
    * appears in `dim.dimKey`. Plan shape: dim aggregates to a 1-row bloom
    * scalar subquery → scan-side `might_contain` prefilter on fact →
    * exact semi join over the survivors.
    */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long = 4000000L): DataFrame =
    fact.filter(bloom_might_contain(
        bloomSubquery(dim, dimKey, expectedItems), col(factKey)))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")

  /** The prefilter alone (false positives included) — for measuring the
    * pruning rate and for pipelines that tolerate approximate containment.
    */
  def prefilter(fact: DataFrame, dim: DataFrame, factKey: String,
                dimKey: String, expectedItems: Long = 4000000L): DataFrame =
    fact.filter(bloom_might_contain(
      bloomSubquery(dim, dimKey, expectedItems), col(factKey)))
}
