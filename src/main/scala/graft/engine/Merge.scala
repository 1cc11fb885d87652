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

  /** [[upsert]] with SCHEMA EVOLUTION (Delta `mergeSchema` semantics): the
    * sides may carry different column sets, as when an upstream producer adds
    * a field mid-stream. Output schema = union of both schemas; base rows take
    * NULL for columns only the updates have, and matched rows keep their base
    * value for columns the updates lack (insert rows take NULL there).
    *
    * Key columns must exist on both sides. Like [[upsert]], an update cannot
    * deliberately null out an existing value — NULL in an update column means
    * "no change" (coalesce semantics), the documented MERGE trade-off.
    *
    * Scale: identical plan to [[upsert]] (the null-padding is a zero-cost
    * projection); evolution costs nothing at read time because parquet
    * snapshots are self-describing. */
  def upsertEvolving(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val baseCols = base.columns.toSet
    val updCols = updates.columns.toSet
    require(keys.forall(k => baseCols(k) && updCols(k)),
      s"upsertEvolving: keys ${keys.mkString(",")} must exist on both sides")
    val b2 = updates.schema.fields.filterNot(f => baseCols(f.name))
      .foldLeft(base)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    val u2 = base.schema.fields.filterNot(f => updCols(f.name))
      .foldLeft(updates)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    upsert(b2, u2.select(b2.columns.map(col).toSeq: _*), keys)
  }

  /** SCD type-2 apply: merge a batch of attribute updates into a versioned
    * dimension, closing changed rows and inserting new versions.
    *
    * `dim` carries (key, attrs..., valid_from, valid_to, is_current);
    * `updates` carries (key, attrs..., `effTsCol`) with at most one row per
    * key (dedup upstream — e.g. keep-latest by timestamp — if the feed can
    * repeat keys). Per key:
    *   - attrs unchanged (or key absent from updates) → row kept as-is;
    *   - attrs changed → current row closed (valid_to = eff ts,
    *     is_current = false) PLUS a new current version inserted;
    *   - key new → inserted as current.
    * History rows (is_current = false) pass through untouched.
    *
    * Shape: one join of the CURRENT slice against the update batch on the
    * key, plus unions — history is never joined or rewritten, so the cost is
    * O(|current| + |updates|) regardless of how deep the version history
    * grows. At scale, partition the stored dimension by is_current (or keep
    * current/history as separate tables) so the history scan drops out
    * entirely; updates are typically tiny → broadcast the update side. */
  def scd2Apply(dim: DataFrame, updates: DataFrame, key: String,
                attrCols: Seq[String], effTsCol: String): DataFrame = {
    val cur = dim.filter(col("is_current")).as("c")
    val hist = dim.filter(!col("is_current"))
    val u = updates.as("u")
    // Null-SAFE comparison: with =!=, a NULL attribute on either side makes
    // `changed` NULL and the key falls out of kept, closed, AND inserted —
    // the row would silently vanish from the dimension.
    val changed = attrCols.map(a => !(col(s"c.$a") <=> col(s"u.$a"))).reduce(_ || _)
    val joined = cur.join(u, col(s"c.$key") === col(s"u.$key"), "full_outer")

    def dimCols(side: String) =
      (col(s"$side.$key").as(key) +: attrCols.map(a => col(s"$side.$a").as(a)))
    // Kept: current rows with no update or an identical update.
    val kept = joined.filter(col(s"u.$key").isNull || (col(s"c.$key").isNotNull && !changed))
      .select(dimCols("c") ++ Seq(col("c.valid_from").as("valid_from"),
        col("c.valid_to").as("valid_to"), col("c.is_current").as("is_current")): _*)
    // Closed: the superseded version of changed keys.
    val closed = joined.filter(col(s"c.$key").isNotNull && col(s"u.$key").isNotNull && changed)
      .select(dimCols("c") ++ Seq(col("c.valid_from").as("valid_from"),
        col(s"u.$effTsCol").as("valid_to"), lit(false).as("is_current")): _*)
    // Inserted: new versions of changed keys + brand-new keys.
    val inserted = joined.filter(col(s"u.$key").isNotNull && (col(s"c.$key").isNull || changed))
      .select(dimCols("u") ++ Seq(col(s"u.$effTsCol").as("valid_from"),
        lit(null).cast(dim.schema("valid_to").dataType).as("valid_to"),
        lit(true).as("is_current")): _*)
    hist.select(kept.columns.map(col): _*)
      .unionByName(kept).unionByName(closed).unionByName(inserted)
  }

  /** SCD type-2 delete: a key leaving the source universe (account closed,
    * product retired, GDPR erasure of the ENTITY — for row purging see
    * [[graft.engine.Tombstones]]) does not vanish from a versioned
    * dimension; its CURRENT version is closed at the delete's effective
    * timestamp and no new version is inserted, so point-in-time joins keep
    * resolving historical facts while post-deletion lookups find nothing
    * current.
    *
    * `deletes` carries (key, `effTsCol`), at most one row per key. Shape:
    * like [[scd2Apply]], only the current slice is touched — one equi-join
    * (delete batches are tiny → broadcast) plus an anti join; history rows
    * pass through unjoined, so cost is O(|current| + |deletes|). */
  def scd2Delete(dim: DataFrame, deletes: DataFrame, key: String,
                 effTsCol: String): DataFrame = {
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))
    val d = deletes.select(col(key), col(effTsCol).as("__eff"))
    val closed = cur.join(d, Seq(key))
      .select(dim.columns.map {
        case "valid_to"   => col("__eff").as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c            => col(c)
      }.toSeq: _*)
    val kept = cur.join(d.select(col(key)), Seq(key), "left_anti")
      .select(dim.columns.map(col).toSeq: _*)
    hist.select(dim.columns.map(col).toSeq: _*)
      .unionByName(kept).unionByName(closed)
  }
}
