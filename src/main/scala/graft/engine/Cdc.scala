package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between table snapshots.
  *
  * The reference pipeline republishes full gold snapshots each run
  * (reference silver_to_gold.py writes whole tables); downstream consumers of
  * such a store need the DELTA between two published versions — what was
  * inserted, deleted, or updated — to feed incremental loads, cache
  * invalidation, or audit trails. `snapshotDiff` computes that delta as one
  * key-partitioned join, the standard "diff two snapshots" CDC formulation.
  *
  * Scale: ONE shuffle on the key for both sides (a full outer hash join);
  * no broadcast ceiling, AQE handles skewed keys. The change predicate
  * compares the non-key columns null-safely, so a column going NULL→value or
  * value→NULL is an update, not a spurious match. At 100 TB the join is
  * exactly the plan you want — each executor diffs its key range
  * independently; if both snapshots are bucketed by the key the exchange
  * disappears entirely.
  */
object Cdc {

  /** Row-level diff of `newDf` against `oldDf` keyed by `keys`.
    *
    * Returns the key columns, `change_type` ∈ {insert, delete, update}, and
    * every non-key column twice: `old_<c>` (null for inserts) and `new_<c>`
    * (null for deletes). Unchanged rows are dropped — the output size is
    * ∝ churn, not table size.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "snapshotDiff: no non-key columns to compare")
    require(newDf.columns.sorted.sameElements(oldDf.columns.sorted),
      s"snapshotDiff: schema mismatch ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")

    // Pack each side's values into ONE struct before the join: the null-safe
    // change predicate is then a single struct comparison (codegen'd), and a
    // row's presence test is `side IS NOT NULL` without consulting per-column
    // nullability.
    val o = oldDf.select(keys.map(col) :+ struct(valueCols.map(col): _*).as("__old"): _*)
    val n = newDf.select(keys.map(col) :+ struct(valueCols.map(col): _*).as("__new"): _*)

    val joined = o.join(n, keys, "full_outer")
    val changeType = when(col("__old").isNull, lit("insert"))
      .when(col("__new").isNull, lit("delete"))
      .otherwise(lit("update"))

    joined
      .filter(col("__old").isNull || col("__new").isNull ||
        !(col("__old") <=> col("__new")))
      .select(
        keys.map(col) ++
          Seq(changeType.as("change_type")) ++
          valueCols.map(c => col(s"__old.$c").as(s"old_$c")) ++
          valueCols.map(c => col(s"__new.$c").as(s"new_$c")): _*)
  }

  /** Incremental view maintenance for additive aggregates: apply a
    * [[snapshotDiff]] changeset to a pre-aggregated
    * `groupBy(groupCol).agg(count AS nCol, sum(valueCol) AS sumCol)` gold
    * table, producing the post-change gold WITHOUT re-reading the base table.
    *
    * Each change row contributes its old image negatively (delete + update's
    * before-image, attributed to the OLD group) and its new image positively
    * (insert + update's after-image, attributed to the NEW group) — so an
    * update that MOVES a row across groups debits one group and credits the
    * other. The per-group deltas are aggregated and outer-joined onto the
    * gold; groups whose count reaches zero are dropped, groups that first
    * appear in the changeset are created.
    *
    * Scale: cost ∝ |changes| (narrow projections + one small aggregation)
    * plus one join against the |groups|-sized gold — at 100 TB with 0.1%
    * daily churn that is a ~100 GB maintenance job instead of a 100 TB
    * recompute. Only ADDITIVE aggregates are maintainable this way
    * (count/sum, and avg = sum/count downstream); for MIN/MAX use
    * [[applyDeltaWithExtremes]], which rebuilds just the affected groups.
    *
    * `valueCol` must be NON-NULL (true of every current caller — the value
    * is always derived from a non-null source): a group whose values are all
    * NULL has a NULL sum under recompute, but the maintained gold coalesces
    * the stored sum to 0, so such a group would drift to `0 + delta`.
    */
  def applyDeltaToSums(goldAgg: DataFrame, changes: DataFrame, groupCol: String,
                       valueCol: String, nCol: String, sumCol: String): DataFrame = {
    val minus = changes
      .filter(col("change_type").isin("delete", "update"))
      .select(col(s"old_$groupCol").as(groupCol),
        lit(-1L).as("__dn"), (-col(s"old_$valueCol")).as("__dv"))
    val plus = changes
      .filter(col("change_type").isin("insert", "update"))
      .select(col(s"new_$groupCol").as(groupCol),
        lit(1L).as("__dn"), col(s"new_$valueCol").as("__dv"))
    val delta = minus.unionByName(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dv")).as("__dv"))
    goldAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("__dn"), lit(0L))).as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("__dv"), lit(0L))).as(sumCol))
      .filter(col(nCol) > 0)
  }

  /** Incremental view maintenance WITH non-additive extremes: keep a
    * `groupBy(groupCol).agg(count, sum, min, max)` gold current against a
    * [[snapshotDiff]] changeset, reading the new base ONLY for groups whose
    * extreme might have shrunk.
    *
    * count/sum go through [[applyDeltaToSums]]. MIN/MAX are additive only in
    * the GROWING direction — an inserted value extends the stored extreme
    * via `least`/`greatest`, but a removed value equal to the stored extreme
    * needs the runner-up, which no delta carries. So the changeset's
    * removals are tested against the stored extremes (null-safely; the test
    * is conservative — any removal EQUAL to the extreme flags the group,
    * even if a twin value survives), and only flagged groups are rebuilt
    * from `newBase` behind a semi-join on the group key; everything else is
    * pure delta arithmetic.
    *
    * Scale: the rebuild is a group-pruned recompute — partition or cluster
    * the base on `groupCol` and the semi-join reads only at-risk partitions;
    * a churn wave whose removals never touch a stored extreme reads ZERO
    * base rows. This is the textbook IVM treatment of non-distributive
    * aggregates: maintain what telescopes, recompute (narrowly) what
    * doesn't. */
  def applyDeltaWithExtremes(goldAgg: DataFrame, changes: DataFrame,
                             newBase: DataFrame, groupCol: String,
                             valueCol: String, nCol: String, sumCol: String,
                             minCol: String, maxCol: String): DataFrame = {
    val sums = applyDeltaToSums(goldAgg.select(col(groupCol), col(nCol), col(sumCol)),
      changes, groupCol, valueCol, nCol, sumCol)
    val ins = changes.filter(col("change_type").isin("insert", "update"))
      .groupBy(col(s"new_$groupCol").as(groupCol))
      .agg(min(col(s"new_$valueCol")).as("__ins_min"),
        max(col(s"new_$valueCol")).as("__ins_max"))
    val rem = changes.filter(col("change_type").isin("delete", "update"))
      .groupBy(col(s"old_$groupCol").as(groupCol))
      .agg(count(lit(1)).as("__rem_n"),
        min(col(s"old_$valueCol")).as("__rem_min"),
        max(col(s"old_$valueCol")).as("__rem_max"))
    val marked = goldAgg.select(col(groupCol), col(minCol), col(maxCol))
      .join(ins, Seq(groupCol), "full_outer")
      .join(rem, Seq(groupCol), "full_outer")
      .withColumn("__risk", col("__rem_n").isNotNull &&
        ((col("__rem_min") <=> col(minCol)) || (col("__rem_max") <=> col(maxCol))))
    // Safe groups: extremes only grow — least/greatest skip nulls, so a
    // group absent from gold (all-new) takes the inserted extremes and a
    // group absent from the changeset keeps its stored ones.
    val safe = marked.filter(!col("__risk"))
      .select(col(groupCol),
        least(col(minCol), col("__ins_min")).as("__min"),
        greatest(col(maxCol), col("__ins_max")).as("__max"))
    val rebuilt = newBase.select(col(groupCol), col(valueCol))
      .join(marked.filter(col("__risk")).select(col(groupCol)),
        Seq(groupCol), "left_semi")
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    sums.join(safe.unionByName(rebuilt), Seq(groupCol), "left")
      .select(col(groupCol), col(nCol), col(sumCol),
        col("__min").as(minCol), col("__max").as(maxCol))
  }

  /** Incremental maintenance of an EQUI-JOIN view `V = A ⋈ B` on `keys` —
    * the JOIN sibling of [[applyDeltaToSums]]'s aggregate IVM. Given the
    * previous view, both NEW snapshots, and the set of join-key values
    * touched by either side's delta, the new view is
    *
    *   V₁ = (V₀ anti-join K)  ∪  ((A₁ semi-join K) ⋈ (B₁ semi-join K))
    *
    * — untouched rows survive verbatim; only the affected key SLICE is
    * re-joined from the new snapshots. Correct for inserts, updates, and
    * deletes on either side (a deleted key simply re-joins to nothing), as
    * long as `deltaKeys` covers every key whose A- or B-rows changed —
    * for an update that MOVES a row across join keys, that means both the
    * old and the new key (the [[snapshotDiff]] changeset carries both).
    *
    * Scale: `deltaKeys` is delta-sized and broadcast into all three
    * prunes, so maintenance cost is one scan of V₀ (scan-speed anti join)
    * plus a join over the affected slices only — NEVER a full A₁ ⋈ B₁
    * recompute. With V₀ and the snapshots clustered on the join key, the
    * semi joins prune to the affected files (the q74/q144 skipping path).
    * This is the standard delta-join algebra folded to its stable form:
    * ΔV = (A⋈B) restricted to changed keys, applied as replace-by-key. */
  def maintainJoinView(prevView: DataFrame, newA: DataFrame, newB: DataFrame,
                       deltaKeys: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "maintainJoinView: need at least one join key")
    val k = broadcast(deltaKeys.select(keys.map(col): _*).distinct())
    prevView.join(k, keys, "left_anti")
      .unionByName(
        newA.join(k, keys, "left_semi")
          .join(newB.join(k, keys, "left_semi"), keys, "inner"))
  }
}
