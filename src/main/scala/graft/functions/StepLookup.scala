package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** As-of (step-function) lookup against a small broadcast-style time series:
  * for a long sort key (e.g. epoch day), return the value of the latest series
  * entry with `key ≤ input` — null before the first entry.
  *
  * This is the scalar core of an as-of join when the right side is dimension-
  * sized (rates, configs, exchange tables): the series ships inside the plan as
  * two primitive arrays (every executor gets them once, like a broadcast), and
  * each probe is an O(log n) binary search inside whole-stage codegen. No join,
  * no shuffle, no per-row lambda. For a large right side, range-partition both
  * inputs and sort-merge within partitions instead.
  *
  * `keys` must be strictly increasing (validated at construction).
  */
case class StepLookup(child: Expression, keys: Array[Long], values: Array[Double])
    extends UnaryExpression {

  require(keys.length == values.length && keys.length > 0, "series must be non-empty")
  require(keys.zip(keys.tail).forall { case (a, b) => a < b }, "keys must be strictly increasing")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_step_lookup"

  private def indexFor(k: Long): Int = {
    val i = Arrays.binarySearch(keys, k)
    if (i >= 0) i else -i - 2 // insertion point minus one = latest key ≤ k
  }

  override def nullSafeEval(input: Any): Any = {
    val i = indexFor(input.asInstanceOf[Long])
    if (i < 0) null else java.lang.Double.valueOf(values(i))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("stepKeys", keys, "long[]")
    val valuesRef = ctx.addReferenceObj("stepValues", values, "double[]")
    val i = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |int $i = java.util.Arrays.binarySearch($keysRef, $c);
         |if ($i < 0) $i = -$i - 2;
         |if ($i < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $valuesRef[$i];
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StepLookup =
    copy(child = newChild)
}

object StepLookup {
  /** Column form: `asOfLookup(sortKey, series)` with `series` sorted by key. */
  def asOfLookup(key: Column, series: Seq[(Long, Double)]): Column = {
    val sorted = series.sortBy(_._1)
    Bridge.column(StepLookup(Bridge.expression(key),
      sorted.map(_._1).toArray, sorted.map(_._2).toArray))
  }
}
