package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 60 bits of `md5(s)` as a non-negative BIGINT — bit-identical to the
  * SQL form `conv(substring(md5(s), 1, 15), 16, 10)` that the DuckDB oracle
  * replays, but computed straight from the digest bytes.
  *
  * The SQL form allocates three strings per input (32-char hex, 15-char
  * substring, and conv's parse) on top of the digest itself. In the portable
  * MinHash/SimHash pipelines that chain runs once per shingle/token — millions
  * of rows at bench scale — and the resulting young-gen churn made q39's
  * wall time swing 2.5–44s run-to-run. The first 15 hex chars are just the
  * first 60 bits of the digest big-endian, so this expression folds the first
  * 8 digest bytes into an unsigned 64-bit value and shifts off the low nibble:
  * same number, no intermediate strings.
  *
  * Null semantics: null input → null (UnaryExpression default).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.Md5Prefix60.hash($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  /** One MessageDigest per executor thread, reused across rows.
    * `MessageDigest.getInstance` (what commons-codec does per call) takes a
    * synchronized JCA provider lookup — with 32 executor threads each hashing
    * millions of shingles, that lock serialized the scan unpredictably
    * (observed as 2.5–65s swings on identical reps of the portable-MinHash
    * queries). A digest is stateful but single-threaded use + reset() is its
    * documented reuse pattern. */
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The calling thread's reusable digest (shared with [[Md5Hex]]). */
  private[functions] def digest(): java.security.MessageDigest = localDigest.get()

  /** md5 the UTF-8 bytes, fold the first 8 digest bytes big-endian, drop the
    * low nibble → the 60-bit value `conv(substring(md5(s),1,15),16,10)` gives. */
  def hash(s: UTF8String): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Lowercase hex md5 — value-identical to Spark's `md5()` function, computed
  * with the shared thread-local digest instead of a per-row
  * `MessageDigest.getInstance` (see [[Md5Prefix60]] for why that lookup is a
  * contention point at local[32]). Hex encoding writes straight into a byte
  * array — no intermediate java.lang.String.
  *
  * Null semantics: null input → null (UnaryExpression default).
  */
case class Md5Hex(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_md5_hex"

  override protected def nullSafeEval(input: Any): Any =
    Md5Hex.hex(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.Md5Hex.hex($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Hex =
    copy(child = newChild)
}

object Md5Hex {
  private val HexDigits = "0123456789abcdef".getBytes

  def hex(s: UTF8String): UTF8String = {
    val md = Md5Prefix60.digest()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Column-level entry points for the custom hash expressions. */
object HashFunctions {

  /** `graft_md5_prefix60(s)` — codegen'd first-60-bits-of-md5 as BIGINT. */
  def md5Prefix60(s: Column): Column =
    Bridge.column(Md5Prefix60(Bridge.expression(s)))

  /** `graft_md5_hex(s)` — codegen'd lowercase-hex md5, value-identical to
    * Spark's `md5()` without its per-row provider lookup. */
  def md5Hex(s: Column): Column =
    Bridge.column(Md5Hex(Bridge.expression(s)))
}
