package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Per-GROUP top-k as a custom physical operator — tier (c) of the
  * custom-operator ladder in full: LogicalPlan node → Strategy → SparkPlan.
  *
  * Spark's built-in answers are `TakeOrderedAndProject` (GLOBAL top-k only)
  * or a `row_number()` window + filter, which SORTS every row of every group
  * to keep k of them — at 10⁹ rows per group that sort is the whole cost.
  * [[GroupedTopKExec]] instead keeps a bounded min-heap of k entries per
  * group and streams the partition once: memory ∝ groups·k, no sort
  * anywhere, and a PARTIAL pass runs before the exchange (the aggregation
  * pattern) so the shuffle carries at most k rows per (partition, group)
  * instead of the raw data — top-k distributes because
  * topK(A ∪ B) = topK(topK(A) ∪ topK(B)).
  *
  * Ordering contract: rows are ranked by `(valueCol, tieCol)` DESCENDING,
  * both `LongType`; the pair must be unique within a group (the tie column
  * makes the order total — without it the k-th boundary would be an
  * arbitrary-row coin flip). Rows where `valueCol` IS NULL are excluded
  * (SQL ordering semantics for a ranking filter). Output rows are the
  * surviving inputs, in no particular order.
  */
case class GroupedTopKPlan(groupCols: Seq[Expression], valueCol: Expression,
                           tieCol: Expression, k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k >= 1, s"GroupedTopKPlan: k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKPlan =
    copy(child = newChild)
}

object GroupedTopK {

  /** `df` filtered to each group's top `k` rows by `(valueCol, tieCol)`
    * descending. Requires [[GroupedTopKStrategy]] installed on the session
    * (`spark.experimental.extraStrategies`) — planning fails loudly
    * otherwise. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   tieCol: String, k: Int): DataFrame = {
    val lp = df.queryExecution.analyzed
    def resolve(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"GroupedTopK: no column '$n' in ${lp.output.map(_.name).mkString(", ")}"))
    Seq(valueCol, tieCol).foreach { c =>
      require(resolve(c).dataType == LongType,
        s"GroupedTopK: '$c' must be LongType, got ${resolve(c).dataType}")
    }
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      GroupedTopKPlan(groupCols.map(resolve), resolve(valueCol), resolve(tieCol), k, lp))
  }
}

/** Plans [[GroupedTopKPlan]] as partial → exchange → final, exactly like a
  * two-phase aggregate: the partial exec accepts any distribution and caps
  * each input partition's contribution at k rows per group; EnsureRequirements
  * then inserts the hash exchange the final exec's `ClusteredDistribution`
  * demands. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKPlan(g, v, t, k, child) =>
      GroupedTopKExec(g, v, t, k, partial = false,
        GroupedTopKExec(g, v, t, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GroupedTopKExec(groupCols: Seq[Expression], valueCol: Expression,
                           tieCol: Expression, k: Int, partial: Boolean,
                           child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val out = child.output
    val gExprs = groupCols
    val vExpr = valueCol
    val tExpr = tieCol
    val cap = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(gExprs, out)
      val v = BindReferences.bindReference(vExpr, out)
      val t = BindReferences.bindReference(tExpr, out)
      // min-heap per group: head is the WORST kept entry (reverse ordering),
      // so an incoming row only displaces it when strictly better
      final case class Entry(value: Long, tie: Long, row: InternalRow)
      val worstFirst: Ordering[Entry] =
        Ordering.by[Entry, (Long, Long)](e => (e.value, e.tie)).reverse
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[Entry]]()
      while (iter.hasNext) {
        val row = iter.next()
        val value = v.eval(row)
        if (value != null) {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)
            heaps.put(key.copy(), heap)
          }
          val vl = value.asInstanceOf[Long]
          val tl = t.eval(row).asInstanceOf[Long]
          if (heap.size < cap) {
            heap.enqueue(Entry(vl, tl, row.copy()))
          } else {
            val worst = heap.head
            if (vl > worst.value || (vl == worst.value && tl > worst.tie)) {
              heap.dequeue()
              heap.enqueue(Entry(vl, tl, row.copy()))
            }
          }
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator.map(_.row))
    }, preservesPartitioning = true)
  }
}
