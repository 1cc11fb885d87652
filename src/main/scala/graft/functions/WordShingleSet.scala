package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-word shingles of a text column, as one codegen'd pass.
  *
  * Replaces the pure-Column formulation
  * `array_distinct(transform(sequence(0, n-k), i => array_join(slice(toks, i+1, k), " ")))`
  * which is correct but interpreted: `transform`/`sequence`/`slice`/`array_join`
  * are collection higher-order functions, so every shingle position allocates a
  * lambda frame, a sliced array, and a joined string through the interpreter.
  * Profiling showed that stage alone at 6–36s per run on the sf0.1 near-dedup
  * corpus (the 6× swing is the allocation churn competing with G1's concurrent
  * phases) — this expression does the same work in a single generated loop.
  *
  * Semantics are kept bit-identical to the Column form (asserted in ExtSpec):
  *   - tokens = `split(trim(text), "\\s+")` — ASCII-space trim, Java regex
  *     split with limit -1 (trailing empty tokens kept), empty text → [""];
  *   - `tokens.length >= k` → k-gram strings joined with a single space,
  *     deduplicated keeping first occurrence (array_distinct order);
  *   - fewer than k tokens → single-element array [trim(text)].
  *
  * Null semantics: null input → null (UnaryExpression default).
  */
case class WordShingleSet(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingleSet.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.WordShingleSet.compute($c, $k);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingleSet =
    copy(child = newChild)
}

object WordShingleSet {
  private val Whitespace = Pattern.compile("\\s+")

  /** The whole shingle-set computation for one document. Returns ArrayData of
    * UTF8String, never null. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    // UTF8String.trim() strips ASCII 0x20 only — same as Spark's trim().
    val trimmed = text.trim().toString
    val toks = Whitespace.split(trimmed, -1)
    if (toks.length < k) {
      new GenericArrayData(Array[Any](UTF8String.fromString(trimmed)))
    } else {
      // LinkedHashSet = array_distinct's keep-first-occurrence order.
      val seen = new java.util.LinkedHashSet[String](math.max(16, toks.length * 2))
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - k) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column entry point. */
  def apply(text: Column, k: Int): Column =
    Bridge.column(new WordShingleSet(Bridge.expression(text), k))
}
