package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, Md5Hex, Md5Prefix60, WordShingleSet}

/** Engine extension installer (`SparkSessionExtensions`): registers the custom
  * Catalyst expressions under SQL names so `spark.sql("… graft_dot(a, b) …")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * This is the (b) tier of the custom-operator ladder (SURVEY.md §7.6): scalar
  * expressions via `injectFunction`; no custom LogicalPlan/Strategy is needed for
  * the parity surface (SURVEY.md §4 — the reference has no operator Spark lacks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def register(ext: SparkSessionExtensions, name: String, clazz: Class[_])
                      (build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      build))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_dot", classOf[DotProduct]) { c => DotProduct(c(0), c(1)) }
    register(ext, "graft_md5_hex", classOf[Md5Hex]) { c => Md5Hex(c(0)) }
    register(ext, "graft_md5_prefix60", classOf[Md5Prefix60]) { c => Md5Prefix60(c(0)) }
    // k must be a foldable int literal (e.g. graft_word_shingles(text, 3)).
    register(ext, "graft_word_shingles", classOf[WordShingleSet]) { c =>
      val k = c(1).eval() match {
        case i: Int => i
        case other => throw new IllegalArgumentException(
          s"graft_word_shingles: k must be an int literal, got $other")
      }
      WordShingleSet(c(0), k)
    }
  }
}
