package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Merge-on-read row-level deletes for an immutable parquet table — the
  * deletion-vector analog for the plain-directory layout this engine uses.
  *
  * The reference can only delete by rewriting a whole silver/gold snapshot
  * (`storage/local_storage.py:33-155` has no delete path at all; its
  * "nothing is ever deleted" bronze contract pushes every correction into a
  * full downstream recompute). At 100 TB a GDPR-style key purge that
  * rewrites the table is days of IO for kilobytes of change. Merge-on-read
  * inverts the cost: a delete WRITES only the doomed keys (an append-only
  * tombstone log), readers subtract them with one anti-join, and a
  * background [[compactApply]] folds the tombstones into a rewritten copy
  * when their count — not urgency — justifies the IO (same bin-packing as
  * [[Layout.compact]]).
  *
  * Layout: `tombDir/d=<batchId>/` parquet of key columns, one directory per
  * delete batch. A batch becomes visible atomically via the file committer's
  * `_SUCCESS` marker; [[committedBatches]] ignores directories without it,
  * so a crashed delete writer exposes nothing (same posture as the versioned
  * store's commit manifest, [[Incremental.commitVersion]]). Batches are
  * append-only and never overwritten — re-deleting a key is a no-op under
  * anti-join, so retries are idempotent by construction.
  *
  * Scale: the read-path anti-join shuffles on the key unless the tombstone
  * set broadcasts — and it usually does, because compaction is triggered
  * precisely to keep it small. The decision is left to Catalyst/AQE (the
  * union of batches is tiny parquet; its size estimate drives auto
  * broadcast), so no hint is hard-coded here.
  */
object Tombstones {

  /** Append delete batch `batchId`: the keys in `keys` (key columns only)
    * become invisible to [[readMergeOnRead]] once the write commits. Batches
    * are append-only — an existing `d=<batchId>` is refused, not replaced. */
  def append(keys: DataFrame, tombDir: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val dest = new Path(s"$tombDir/d=$batchId")
    val fs = dest.getFileSystem(keys.sparkSession.sparkContext.hadoopConfiguration)
    require(!fs.exists(dest),
      s"Tombstones.append: batch $batchId already exists under $tombDir — " +
        "the log is append-only; use a fresh batch id")
    keys.write.mode("errorifexists").parquet(dest.toString)
  }

  /** Committed delete-batch ids under `tombDir`, ascending. Directories
    * without the committer's `_SUCCESS` marker (crashed writer) are
    * invisible. */
  def committedBatches(spark: SparkSession, tombDir: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val path = new Path(tombDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("d=") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("d=").toLong)
      .sorted
  }

  /** The union of all committed tombstone keys, de-duplicated (keys deleted
    * in several batches count once), or None when no batch is committed. */
  def deletes(spark: SparkSession, tombDir: String,
              keyCols: Seq[String]): Option[DataFrame] = {
    val batches = committedBatches(spark, tombDir)
    if (batches.isEmpty) None
    else Some(
      spark.read.parquet(batches.map(b => s"$tombDir/d=$b"): _*)
        .select(keyCols.map(org.apache.spark.sql.functions.col): _*)
        .distinct())
  }

  /** The live view of `dataDir`: its parquet scan minus every committed
    * tombstone key — one LEFT ANTI join, no data rewrite. */
  def readMergeOnRead(spark: SparkSession, dataDir: String, tombDir: String,
                      keyCols: Seq[String]): DataFrame = {
    val base = spark.read.parquet(dataDir)
    deletes(spark, tombDir, keyCols) match {
      case None    => base
      case Some(d) => base.join(d, keyCols, "left_anti")
    }
  }

  /** Materialize the merge-on-read view into `destDir`, bin-packed to
    * `targetFileBytes` like [[Layout.compact]] (narrow coalesce, byte target
    * estimated from the SOURCE size — an upper bound, since deletes only
    * shrink it). Returns the output file count. After the caller swaps
    * `destDir` in for `dataDir`, the tombstone log can be truncated; until
    * then both source and log are untouched, so a crash mid-compact loses
    * nothing. */
  def compactApply(spark: SparkSession, dataDir: String, tombDir: String,
                   destDir: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "compactApply: targetFileBytes must be positive")
    import org.apache.hadoop.fs.Path
    val path = new Path(dataDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    readMergeOnRead(spark, dataDir, tombDir, keyCols = keyColsOf(spark, tombDir))
      .coalesce(n)
      .write.mode("overwrite").parquet(destDir)
    n
  }

  /** Key columns of the tombstone log = the schema of its first committed
    * batch (all batches share it — enforced by parquet union at read). */
  private def keyColsOf(spark: SparkSession, tombDir: String): Seq[String] = {
    val batches = committedBatches(spark, tombDir)
    require(batches.nonEmpty, "compactApply: no committed tombstone batches — nothing to fold")
    spark.read.parquet(s"$tombDir/d=${batches.head}").columns.toSeq
  }
}
