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

/** Codegen'd symmetric int8 quantization of an `array<double>` embedding:
  * `codeᵢ = round(xᵢ · 127 / max|x|)` (round half away from zero, the SQL
  * `ROUND` convention), all-zero vector → all-zero codes. 4×–8× storage
  * compression for embedding tables, the standard trick before ANN indexing
  * (per-vector max-abs scaling keeps relative structure; the scale is
  * recoverable as `max|x| / 127`).
  *
  * Like [[DotProduct]], the HOF formulation (`transform(...)` with a nested
  * `aggregate` for the max) is interpreted per row; this compiles to two tight
  * primitive loops inside whole-stage codegen — the shape a full-corpus
  * quantization pass needs. The multiply-divide order (`x * 127.0 / mx`) is
  * fixed so an independent engine replaying the same IEEE arithmetic produces
  * bit-identical codes (SparkEntry's oracle relies on this).
  *
  * Null semantics: null array → null; element nulls are not expected (dense
  * vectors) and read as 0.0.
  */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType,
      containsNull = false)
  override def prettyName: String = "graft_int8_quantize"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i)); if (v > mx) mx = v; i += 1
    }
    val out = new Array[Int](n)
    if (mx > 0.0) {
      i = 0
      while (i < n) {
        val q = x.getDouble(i) * 127.0 / mx
        out(i) = (if (q >= 0) math.floor(q + 0.5) else math.ceil(q - 0.5)).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val q = ctx.freshName("q")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = Math.abs($a.getDouble($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |int[] $out = new int[$n];
         |if ($mx > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $q = $a.getDouble($i) * 127.0 / $mx;
         |    $out[$i] = (int) ($q >= 0 ? Math.floor($q + 0.5) : Math.ceil($q - 0.5));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** Column-level entry points for the custom vector expressions. */
object VectorFunctions {

  /** `graft_dot(a, b)` — codegen'd Σ aᵢ·bᵢ over array<double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** `graft_int8_quantize(v)` — codegen'd per-vector max-abs int8 codes. */
  def int8Quantize(v: Column): Column =
    Bridge.column(Int8Quantize(Bridge.expression(v)))
}
