package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subject-erasure ("right to be forgotten") propagation: given a set of
  * subject keys to forget, remove every row referencing them across the
  * tables that carry the foreign key, and account for exactly what was
  * removed. The reference has no governance surface at all; a lakehouse
  * serving user data cannot ship without one.
  *
  * Two pieces, deliberately separate:
  *  - [[purge]] — the cleaned frame for ONE table (callers rewrite or feed
  *    [[Tombstones]] for merge-on-read deletion instead of rewriting 100 TB).
  *  - [[audit]] — the per-table accounting row set `(table_name, n_purged,
  *    n_kept)`, the evidence record an erasure request must produce.
  *
  * Scale: the subject set is request-sized (thousands), every data table is
  * corpus-sized — so subjects are broadcast and each table pays one
  * scan-speed anti/semi join; no shuffle of the data tables at all. Rows
  * with a NULL foreign key reference no subject and are always kept. For
  * physical deletion without a rewrite, feed `purge`'s complement (the
  * matched keys) to [[Tombstones.append]] and let compaction apply them.
  */
object Erasure {

  /** `df` minus every row whose `fk` matches a subject key. */
  def purge(df: DataFrame, fk: String,
            subjects: DataFrame, subjectKey: String): DataFrame =
    df.join(broadcast(subjects.select(col(subjectKey).as(fk)).distinct()),
      Seq(fk), "left_anti")

  /** One accounting row per table: rows referencing a subject (`n_purged`)
    * and rows surviving (`n_kept`). Each count is a 1-row aggregate (so
    * empty tables still produce their row — the q89 empty-arm pattern);
    * arms are unioned, not grouped, because there is no data-sized key. */
  def audit(subjects: DataFrame, subjectKey: String,
            tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "Erasure.audit: no tables given")
    val s = subjects.select(col(subjectKey).as("__sk")).distinct()
    tables.map { case (name, df, fk) =>
      val purged = df.join(broadcast(s), col(fk) === col("__sk"), "left_semi")
        .agg(count(lit(1)).as("n_purged"))
      val total = df.agg(count(lit(1)).as("__n_total"))
      purged.crossJoin(total).select(
        lit(name).as("table_name"),
        col("n_purged"),
        (col("__n_total") - col("n_purged")).as("n_kept"))
    }.reduce(_.unionByName(_))
  }
}
