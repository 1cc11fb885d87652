package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is interpreted per row — measured ~40s for 500k pairs of 64-dim vectors at
  * local[4]. This expression compiles to a tight primitive loop inside whole-stage
  * codegen (no lambda dispatch, no intermediate array), which is what a pairwise
  * similarity join needs at any scale. Summation is left-to-right, exactly matching
  * the fold semantics, so results are bit-identical to the HOF form (and to a
  * sequential C loop, which keeps the DuckDB oracle comparable after 6-dp rounding).
  *
  * Null semantics: null input array → null (BinaryExpression default); element
  * nulls are not expected (embedding vectors are dense) and read as 0.0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      // fail fast: a silent prefix-dot would make every similarity/LSH/IVF
      // result quietly wrong on a dimension mismatch
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch ($n vs ${y.numElements()})")
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the custom vector expressions. */
object VectorFunctions {

  /** `graft_dot(a, b)` — codegen'd Σ aᵢ·bᵢ over array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
