package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense and needs no code. Salting is for
  * the cases AQE can't fix: skewed AGGREGATION keys, or a skewed shuffle
  * join where one hot key exceeds a single task even after AQE splits.
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a smaller `dim` side:
    * big rows get a deterministic salt from a row-identity column, the dim
    * side is replicated `factor` ways, and the join key becomes
    * (key, salt) — a hot key's rows spread over `factor` tasks.
    *
    * Exactly equivalent to `big.join(dim, keys, "inner"/"left")`.
    * Replication multiplies the dim shuffle volume by `factor`; pick
    * `factor` ≈ hottest-key-rows / target-task-rows.
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFrom: String, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    // right/full would keep every replicated copy of an unmatched dim row —
    // silently wrong, so the contract is enforced.
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin is equivalence-preserving only for inner/left, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltFrom)), lit(factor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase skew-tolerant aggregation: partial-aggregate on
    * (keys, salt) first, then final-aggregate on keys. For algebraic
    * aggregates (sum/count/min/max) this is exactly the map-side-combine
    * plan Spark already generates — provided here for composed metrics
    * (e.g. sums feeding ratios) where the two phases are written manually.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     factor: Int, saltFrom: String): DataFrame = {
    require(factor > 0)
    // Salt must come from a (near-)unique row identity — salting on the
    // aggregated value would collapse when hot keys carry few distinct
    // values, putting the whole hot key back in one task.
    val partial = df
      .withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(factor)).cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__c")).as("n"))
  }
}
