package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping over plain parquet — the file-pruning half of a
  * Delta/Iceberg transaction log (see README "Table format" section; the
  * other half, concurrent-writer commits, is out of scope for the
  * single-writer medallion layout the reference operates).
  *
  * [[writeStats]] makes one distributed pass over a table and records, per
  * physical file, row count and min/max/null-count for the requested columns
  * — the same per-file stats a Delta log's `stats` JSON carries. The stats
  * table is tiny (a few scalars per FILE, independent of row count: a 100 TB
  * table in 1 GB files is ~100k stats rows) and lands in an
  * underscore-prefixed subdirectory, which Spark's file listing ignores, so
  * normal reads of the table are unaffected.
  *
  * [[readRange]] prunes driver-side on that metadata — exactly where Spark's
  * own partition pruning runs — and hands the surviving file list to the
  * scan. Parquet footer min/max then skips row groups WITHIN each kept file;
  * this module skips whole files without opening them, which is the win that
  * matters when most files are irrelevant (clustered layouts: date
  * partitioning + [[Layout.zorderBy]] make per-file ranges tight, so a
  * 2-dimensional range predicate keeps O(√nFiles) of them).
  */
object Skipping {

  /** Stats subdirectory name. The leading underscore makes Hadoop/Spark file
    * listings treat it as hidden metadata (same convention as `_SUCCESS`,
    * Delta's `_delta_log`), so `spark.read.parquet(tablePath)` never sees it.
    *
    * Stats are a snapshot of the file set at [[writeStats]] time: any rewrite
    * of the table (compaction, z-order re-clustering, appends) must re-run
    * [[writeStats]] — exactly as a Delta log rewrites its stats on OPTIMIZE.
    * Pruning against stale stats is detected, not silent, in BOTH directions:
    * every pruned read first compares the stats manifest's file set against
    * the table's current listing (driver-side metadata, no data read) and
    * fails loudly on any added OR removed file — without the check, files
    * appended after [[writeStats]] would be silently omitted from results. */
  val StatsDir = "_graft_stats"

  /** `input_file_name()` (and `DataFrame.inputFiles`) return URL-encoded
    * URIs — a path with a space arrives as `file:...%20...`. Everything
    * driver-side (freshness compare, handing paths back to
    * `spark.read.parquet`) works in DECODED path space so encoded and raw
    * spellings of the same file can never alias apart. Non-URI strings pass
    * through untouched. */
  private def decodePath(uri: String): String =
    try {
      val p = new java.net.URI(uri).getPath
      if (p == null || p.isEmpty) uri else p
    } catch { case _: java.net.URISyntaxException => uri }

  /** Fails loudly if `recorded` (a stats/index manifest's file set) no longer
    * equals the table's current listing — the append/rewrite staleness guard
    * shared by every pruned read. Driver-side metadata only, no data read. */
  private def requireFresh(spark: SparkSession, tablePath: String,
                           recorded: Set[String], manifest: String): Unit = {
    val current = spark.read.parquet(tablePath).inputFiles.map(decodePath).toSet
    if (recorded != current) {
      val added = current -- recorded
      val removed = recorded -- current
      throw new IllegalStateException(
        s"Skipping: $manifest under $tablePath is stale — " +
          s"${added.size} file(s) added and ${removed.size} removed since it was written " +
          s"(e.g. ${(added ++ removed).take(3).mkString(", ")}); re-run the index build")
    }
  }

  /** Loads the stats table once, verifies the recorded file set still equals
    * the table's current listing, and returns the decoded paths of files the
    * `keep` predicate can't rule out. A null predicate result (all-null
    * min/max stats against a range) counts as "ruled out" — a range predicate
    * never matches null. */
  private def prunedFiles(spark: SparkSession, tablePath: String,
                          keep: org.apache.spark.sql.Column): Seq[String] = {
    val rows = stats(spark, tablePath)
      .select(col("file"), coalesce(keep, lit(false)).as("keep"))
      .collect()
    requireFresh(spark, tablePath, rows.map(r => decodePath(r.getString(0))).toSet, StatsDir)
    rows.filter(_.getBoolean(1)).map(r => decodePath(r.getString(0))).toSeq
  }

  /** One pass over `tablePath`, grouped by physical file: rows, and
    * min/max/null-count per requested column. Overwrites any prior stats.
    * Shuffle payload is one row per (file × column set) — metadata-sized. */
  def writeStats(spark: SparkSession, tablePath: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "writeStats: need at least one column to index")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    }
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"), aggs: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tablePath/$StatsDir")
  }

  /** The stats table written by [[writeStats]]. */
  def stats(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(s"$tablePath/$StatsDir")

  /** Files whose `[min_c, max_c]` interval intersects `[lo, hi]`. Files where
    * the column is entirely null have null min/max and are correctly skipped:
    * a range predicate never matches null. Comparison happens in Spark SQL,
    * so `lo`/`hi` get the same type coercion the real filter would. */
  def candidateFiles(spark: SparkSession, tablePath: String, c: String,
                     lo: Any, hi: Any): Seq[String] =
    prunedFiles(spark, tablePath, col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi))

  /** Range scan that opens only files the stats can't rule out, then applies
    * the exact predicate (stats pruning is conservative, never authoritative).
    * An empty candidate list short-circuits to an empty relation with the
    * table's schema — no file is opened at all. */
  def readRange(spark: SparkSession, tablePath: String, c: String,
                lo: Any, hi: Any): DataFrame =
    readRanges(spark, tablePath, Seq((c, lo, hi)))

  /** `col IS NULL` scan using the recorded null counts: only files with at
    * least one null in `c` are opened. The mirror of range pruning — range
    * predicates skip all-null files, null-seeking reads skip no-null files. */
  def readNulls(spark: SparkSession, tablePath: String, c: String): DataFrame = {
    val files = prunedFiles(spark, tablePath, col(s"nulls_$c") > 0L)
    if (files.isEmpty)
      spark.read.parquet(tablePath).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(col(c).isNull)
  }

  /** Conjunctive multi-column range scan: a file survives only if EVERY
    * `(column, lo, hi)` interval intersects its stats. This is where z-order
    * clustering pays off — [[Layout.zorderBy]] bounds BOTH clustered columns'
    * span per file, so a 2-D predicate over the curve keeps O(√nFiles) files
    * where a 1-D sort would keep all of them for the second column. */
  def readRanges(spark: SparkSession, tablePath: String,
                 ranges: Seq[(String, Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "readRanges: need at least one (column, lo, hi)")
    val keep = ranges.map { case (c, lo, hi) =>
      col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }.reduce(_ && _)
    val files = prunedFiles(spark, tablePath, keep)
    val exact = ranges.map { case (c, lo, hi) =>
      col(c) >= lit(lo) && col(c) <= lit(hi)
    }.reduce(_ && _)
    if (files.isEmpty)
      spark.read.parquet(tablePath).filter(lit(false)) // schema-only, folds to empty
    else
      spark.read.parquet(files: _*).filter(exact)
  }

  /** Bloom index directory for column `c` (underscore-hidden, like
    * [[StatsDir]]). */
  def bloomDir(c: String): String = s"_graft_bloom_$c"

  /** Per-file bloom index over column `c` — the point-lookup complement to
    * [[writeStats]]' min/max ranges. Min/max pruning needs the column
    * CLUSTERED (each file spans a narrow range); a bloom answers "is this
    * exact key in this file?" for a HIGH-CARDINALITY, UNCLUSTERED column —
    * the needle-in-100TB lookup (find one document id, one order, one user)
    * where every file's min/max straddles the probe and range stats keep
    * everything. Same idea as Delta/Iceberg optional bloom column indexes.
    *
    * One distributed pass: keys are `xxhash64`-hashed in the scan, the
    * grouped [[graft.functions.BloomAggregator]] ORs partial sketches
    * map-side, and the index lands as one row of `(file, bloom)` bytes per
    * data file — `expectedItemsPerFile` sizes each sketch (~1.2 KB per 1k
    * items at fpp 0.01), so the whole index stays metadata-sized. */
  def writeBloomIndex(spark: SparkSession, tablePath: String, c: String,
                      expectedItemsPerFile: Long, fpp: Double = 0.01): Unit = {
    val agg = graft.functions.BloomAggregator.bloomAgg(expectedItemsPerFile, fpp)
    spark.read.parquet(tablePath)
      .groupBy(input_file_name().as("file"))
      .agg(agg(xxhash64(col(c))).as("bloom"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tablePath/${bloomDir(c)}")
  }

  /** Point lookup `c = value` opening only files whose bloom might contain
    * the key. The probe value is cast to the table's column type before
    * hashing so build and probe hash identical bytes (an int literal against
    * a bigint column would otherwise xxhash differently). False positives
    * open a file and find nothing; the exact filter keeps the result
    * correct. Same staleness guard as the range reads. */
  def readPoint(spark: SparkSession, tablePath: String, c: String, value: Any): DataFrame = {
    val idx = spark.read.parquet(s"$tablePath/${bloomDir(c)}")
      .select(col("file"), col("bloom")).collect()
    requireFresh(spark, tablePath, idx.map(r => decodePath(r.getString(0))).toSet, bloomDir(c))
    val colType = spark.read.parquet(tablePath).schema(c).dataType
    val hashed = spark.range(1)
      .select(xxhash64(lit(value).cast(colType)).as("h")).head().getLong(0)
    val files = idx
      .filter(r => graft.functions.BloomAggregator.fromBytes(
        r.getAs[Array[Byte]]("bloom")).mightContainLong(hashed))
      .map(r => decodePath(r.getString(0))).toSeq
    if (files.isEmpty)
      spark.read.parquet(tablePath).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(col(c) === lit(value).cast(colType))
  }

  /** COUNT/MIN/MAX answered from parquet FOOTER metadata — no data pages
    * read. Spark's native aggregate pushdown
    * (`spark.sql.parquet.aggregatePushdown`) rewrites the scan to return the
    * footers' row counts and column statistics directly, but only on the
    * DSv2 read path (parquet sits in `spark.sql.sources.useV1SourceList` by
    * default, where the rule never fires) — so this helper flips both confs
    * for the duration of ONE eagerly-collected aggregate and restores them.
    * At 100 TB this is the difference between a full scan and opening ~nFiles
    * footers: the stats-only query every table health check starts with.
    *
    * The plan is VERIFIED pushed ([[pushdownPlanned]] must appear in the
    * optimized scan) — falling back to a silent full scan would keep the
    * same answer while voiding the metadata-only claim, so it throws
    * instead. Filters or unsupported column types (nested, no-stats) break
    * pushdown eligibility; keep the call to top-level primitive columns.
    *
    * Output: one local row `(n_rows, min_<c>, max_<c> …)`. */
  def pushedAggregates(spark: SparkSession, tablePath: String,
                       cols: Seq[String]): DataFrame = {
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = spark.conf.get(v1Key)
    val prevAgg = spark.conf.get(aggKey)
    spark.conf.set(v1Key,
      prevV1.split(",").map(_.trim).filterNot(_ == "parquet").mkString(","))
    spark.conf.set(aggKey, "true")
    try {
      val frame = pushedAggregateFrame(spark, tablePath, cols)
      // the marker lives in the scan node's metadata — executedPlan, not the
      // optimized plan string (which only shows the rewritten RelationV2)
      val plan = frame.queryExecution.executedPlan.toString
      require(plan.contains("PushedAggregation: [COUNT(*)"),
        s"Skipping.pushedAggregates: aggregate was NOT pushed to the scan —\n$plan")
      val rows = frame.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), frame.schema)
    } finally {
      spark.conf.set(v1Key, prevV1)
      spark.conf.set(aggKey, prevAgg)
    }
  }

  /** The lazy aggregate of [[pushedAggregates]] — package-private so PlanSpec
    * can assert `PushedAggregation` lands in the scan (caller must have the
    * two confs set). */
  private[graft] def pushedAggregateFrame(spark: SparkSession, tablePath: String,
                                          cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(tablePath).agg(aggs.head, aggs.tail: _*)
  }
}
