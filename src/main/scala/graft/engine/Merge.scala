package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert semantics over parquet-backed tables — the idiomatic upgrade
  * SURVEY.md §2.1 (OP-8) names for the reference's append-only gold snapshots
  * (`storage/local_storage.py:144-155`: a new full file per run, readers must
  * pick the latest). A Delta-style `MERGE INTO` expressed as a full-outer join:
  *
  *   - key in both        → the update's row wins ("WHEN MATCHED THEN UPDATE")
  *   - key only in update → inserted                ("WHEN NOT MATCHED THEN INSERT")
  *   - key only in base   → kept unchanged
  *
  * Scale: one shuffle of each side on the merge key — exactly what a real MERGE
  * costs without a transaction log's file-level pruning. When updates are small
  * relative to base, broadcast the update side; when both are large, bucket both
  * tables by the key so the join is exchange-free (see the bucketed-join spec).
  * The `merge_action` column is the audit trail a MERGE's metrics would report.
  */
object Merge {

  /** Full-outer merge of `updates` into `base` on `keys` (same schema both
    * sides). Non-key columns resolve update-first via `coalesce`; `merge_action`
    * records insert / update / keep per row. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = base.columns.filterNot(keys.contains)
    require(updates.columns.sorted.sameElements(base.columns.sorted),
      "merge requires identical schemas")
    val b = base.as("b"); val u = updates.as("u")
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val keyCols = keys.map(k => coalesce(col(s"u.$k"), col(s"b.$k")).as(k))
    val valCols = dataCols.map(c => coalesce(col(s"u.$c"), col(s"b.$c")).as(c)).toSeq
    val action = when(keys.map(k => col(s"b.$k").isNull).reduce(_ || _), "insert")
      .when(keys.map(k => col(s"u.$k").isNull).reduce(_ || _), "keep")
      .otherwise("update")
    b.join(u, cond, "full_outer")
      .select(keyCols ++ valCols :+ action.as("merge_action"): _*)
  }
}
