package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Single source of truth for the engine's SQL-callable expressions.
  *
  * Both installers — builder-time `plans.GraftExtensions` and the
  * existing-session `Bridge.installGraftFunctions` — consume this list, so a
  * new expression registers on both paths at once and argument validation
  * (e.g. the shingle k must be an int literal) behaves identically everywhere.
  */
object GraftFunctionRegistry {

  /** (SQL name, implementing class, builder). */
  val all: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      (c: Seq[Expression]) => DotProduct(c(0), c(1))),
    ("graft_int8_quantize", classOf[Int8Quantize],
      (c: Seq[Expression]) => Int8Quantize(c(0))),
    ("graft_jaro_winkler", classOf[JaroWinkler],
      (c: Seq[Expression]) => JaroWinkler(c(0), c(1))),
    ("graft_md5_hex", classOf[Md5Hex],
      (c: Seq[Expression]) => Md5Hex(c(0))),
    ("graft_md5_prefix60", classOf[Md5Prefix60],
      (c: Seq[Expression]) => Md5Prefix60(c(0))),
    ("graft_word_shingles", classOf[WordShingleSet],
      (c: Seq[Expression]) => {
        val k = c(1).eval() match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_word_shingles: k must be an int literal, got $other")
        }
        WordShingleSet(c(0), k)
      }),
    // Composed (not a single Expression class): the Morton key of
    // engine.Layout.zorderKey, so layout rewrites are SQL-invokable —
    // `ORDER BY graft_zorder_key(x, y, xmin, xmax, ymin, ymax)`. The four
    // bounds must be numeric literals (they come from a prior 1-row agg).
    ("graft_zorder_key", graft.engine.Layout.getClass,
      (c: Seq[Expression]) => {
        require(c.length == 6,
          "graft_zorder_key(x, y, xmin, xmax, ymin, ymax) takes 6 arguments")
        def bound(e: Expression, name: String): Double = {
          if (!e.foldable) throw new IllegalArgumentException(
            s"graft_zorder_key: $name must be a numeric literal")
          e.eval() match {
            case n: java.lang.Number => n.doubleValue()
            case other => throw new IllegalArgumentException(
              s"graft_zorder_key: $name must be numeric, got $other")
          }
        }
        graft.engine.Layout.zorderKeyExpr(c(0), c(1),
          bound(c(2), "xmin"), bound(c(3), "xmax"),
          bound(c(4), "ymin"), bound(c(5), "ymax"))
      }))
}
