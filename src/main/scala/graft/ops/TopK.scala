package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import graft.plans.TopKPerKey

/** DataFrame API over the custom [[graft.plans.TopKPerKey]] operator.
  * Requires `TopKStrategy` to be registered (GraftExtensions, or any
  * session built `withExtensions(new GraftExtensions)`).
  *
  * Semantics are identical to
  * `row_number().over(Window.partitionBy(keys).orderBy(order.desc, tiebreak)) <= k`
  * (`order.asc` when `asc = true`) but planned as partial top-k →
  * exchange of survivors → final top-k.
  */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], orderCol: String,
             tiebreakCol: String, k: Int, asc: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val plan = TopKPerKey(
      keyCols.map(c => GraftColumnBridge.expression(df(c))),
      GraftColumnBridge.expression(df(orderCol)),
      GraftColumnBridge.expression(df(tiebreakCol)),
      k,
      GraftColumnBridge.analyzedPlan(df),
      asc)
    GraftColumnBridge.ofRows(spark, plan)
  }
}
