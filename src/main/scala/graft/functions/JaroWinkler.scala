package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd Catalyst expression — the
  * record-linkage scorer (Winkler 1990, the Census string comparator) that
  * complements the suite's Levenshtein-based [[graft.ext.Fuzzy]] paths:
  * transposition-tolerant, prefix-boosted, and O(|s|·window) per pair with
  * zero allocation beyond two small boolean arrays (no DP matrix — cheaper
  * than edit distance on the blocked-join candidate streams it scores).
  *
  * CONTRACT — pinned to DuckDB's `jaro_winkler_similarity` so oracle
  * comparison is byte-exact in semantics (probed empirically, spec-pinned):
  *  - operates on UTF-8 BYTES, not code points ('héllo' vs 'hèllo' = 8/9
  *    jaro, the byte answer);
  *  - match window = max(0, ⌊max(|s|,|t|)/2⌋ − 1); window 0 still matches
  *    the same position (so "a"~"a" = 1 while "ab"~"ba" = 0);
  *  - either side empty → 0.0 (including both empty);
  *  - Winkler boost `jw = jaro + ℓ·0.1·(1 − jaro)` with ℓ = common prefix
  *    capped at 4 bytes, applied only when jaro > 0.7.
  * Query boundaries round to 6 dp (the [[graft.ext.Similarity]] cosine
  * discipline) so engine-internal double association stays invisible.
  *
  * Null semantics: null input → null (BinaryExpression default).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.JaroWinkler.similarity($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scalar kernel — static so generated code calls it directly. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val win = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched bytes compared in order; t = mismatches / 2
    var k = 0
    var trans = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val jaro = (mD / ls + mD / lt + (mD - trans / 2.0) / mD) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(ls, lt))
    while (l < maxL && s(l) == t(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
