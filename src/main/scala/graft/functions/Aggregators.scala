package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregates (`org.apache.spark.sql.expressions.Aggregator`)
  * — the custom-AGGREGATE extension surface, complementing this package's
  * custom scalar codegen expressions. Usable three ways: as a
  * `TypedColumn` on `Dataset[T]` (`.toColumn`), as a DataFrame column
  * function (via `udaf`), and from SQL once registered
  * (`GraftExtensions.install`).
  *
  * Determinism: the buffer is exact decimal arithmetic
  * (`BigDecimal.valueOf(double)` = the double's shortest decimal
  * representation), so partial aggregation is associative and commutative
  * — results are bit-identical across partitionings and merge orders,
  * unlike a naive double-sum buffer. The price is ObjectHashAggregate
  * (JVM objects, no codegen): for a PLAIN sum prefer the decimal-cast
  * builtin (the `decSum` pattern in Queries); an Aggregator earns its
  * keep for composed aggregates like this ratio of co-summed terms,
  * which a builtin cannot keep in one exact buffer.
  */
object Aggregators {

  /** Exact-buffer weighted mean: Σ(w·x) / Σ(w) with decimal partials and
    * one double division at finish (num and den each exactly rounded to
    * double, so any engine summing the same decimals agrees bit-for-bit).
    * Inputs are (value, weight); zero total weight finishes to NaN.
    */
  object WeightedMean
      extends Aggregator[(Double, Long), (JBigDecimal, Long), Double] {
    override def zero: (JBigDecimal, Long) = (JBigDecimal.ZERO, 0L)
    override def reduce(b: (JBigDecimal, Long),
                        in: (Double, Long)): (JBigDecimal, Long) =
      (b._1.add(JBigDecimal.valueOf(in._1)
        .multiply(JBigDecimal.valueOf(in._2))), b._2 + in._2)
    override def merge(a: (JBigDecimal, Long),
                       b: (JBigDecimal, Long)): (JBigDecimal, Long) =
      (a._1.add(b._1), a._2 + b._2)
    override def finish(b: (JBigDecimal, Long)): Double =
      if (b._2 == 0L) Double.NaN else b._1.doubleValue() / b._2.toDouble
    // system decimal encoder is DecimalType(38, 18): the buffer's scale is
    // bounded by the value's decimal places (quality scores carry <= 6),
    // so storage through it stays exact
    override def bufferEncoder: Encoder[(JBigDecimal, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** DataFrame/SQL-facing weighted mean: `weighted_mean(x, w)`. */
  val weighted_mean: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(WeightedMean)

  /** Misra–Gries frequent-items summary state: at most k counters. */
  case class MGState(counts: Map[String, Long])

  /** Distributed Misra–Gries heavy-hitter CANDIDATE generation (Misra &
    * Gries '82; mergeable-summaries semantics of Agarwal et al. '12):
    * each partition folds its items into ≤ k counters (hit → increment;
    * room → insert; full → decrement every counter, dropping zeros), and
    * partials merge by summing common counters then subtracting the
    * (k+1)-st largest combined count so the result fits in k again.
    * Guarantee (the reason this is usable as an EXACT operator's first
    * pass): every item with true frequency > N/k survives to the final
    * summary regardless of partitioning or merge order — the summary is a
    * superset of the θ-heavy hitters for any θ > 1/k. The candidate SET
    * is order-dependent (extra sub-threshold items may ride along), so a
    * deterministic gate must re-count candidates exactly and filter on
    * the true counts; `finish` returns the candidates space-joined and
    * sorted, never the noisy estimates. Scale shape: state is O(k) per
    * partition and O(k) over the wire — the corpus token stream itself
    * is never shuffled (contrast a full groupBy count whose map side
    * still emits every distinct token). The buffer is a JVM Map
    * (ObjectHashAggregate, no codegen) — the price of a bounded-state
    * sketch; k is small, so per-row cost is an O(eC) persistent-map
    * update.
    */
  class MisraGries(k: Int)
      extends Aggregator[String, MGState, String] {
    override def zero: MGState = MGState(Map.empty)
    override def reduce(b: MGState, w: String): MGState = {
      val m = b.counts
      m.get(w) match {
        case Some(c)             => MGState(m.updated(w, c + 1L))
        case None if m.size < k  => MGState(m.updated(w, 1L))
        case None =>
          MGState(m.flatMap { case (t, c) =>
            if (c > 1L) Some(t -> (c - 1L)) else None })
      }
    }
    override def merge(a: MGState, b: MGState): MGState = {
      if (a.counts.isEmpty) return b
      if (b.counts.isEmpty) return a
      val comb = (a.counts.keySet ++ b.counts.keySet).iterator
        .map(t => t -> (a.counts.getOrElse(t, 0L) + b.counts.getOrElse(t, 0L)))
        .toMap
      if (comb.size <= k) MGState(comb)
      else {
        // subtract the (k+1)-st largest count from everything; ≤ k survive
        val d = comb.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        MGState(comb.flatMap { case (t, c) =>
          if (c - d > 0L) Some(t -> (c - d)) else None })
      }
    }
    override def finish(b: MGState): String =
      b.counts.keys.toSeq.sorted.mkString(" ")
    override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** DataFrame-facing Misra–Gries candidates: `misra_gries_256(token)` →
    * one space-joined sorted candidate string (≤ 256 tokens).
    */
  val misra_gries_256: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(256), Encoders.STRING)
}
