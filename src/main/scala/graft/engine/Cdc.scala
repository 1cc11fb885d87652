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
}
