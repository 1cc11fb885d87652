package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query names — dump only those
    // (iterating on one oracle without re-running all 80+).
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // read TIMESTAMP(NANOS) parquet footers as long; harmless for MICROS.
      // Session-build-time so no query function ever mutates session conf.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // q09's Spark/DuckDB comparison is only deterministic if duplicate
    // event_ids agree on the flag-relevant columns (both engines then pick an
    // equivalent arbitrary row per id). That invariant lives in the testdata;
    // check it here so a future testdata change fails LOUDLY at verify time
    // instead of surfacing as a flaky q09 hash mismatch.
    {
      import org.apache.spark.sql.functions.{col, countDistinct, struct, max}
      val worst = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy(col("event_id"))
        .agg(countDistinct(struct(col("event_type"), col("value"))).as("variants"))
        .agg(max(col("variants"))).head().getLong(0)
      require(worst <= 1L,
        s"q09 precondition violated: some event_id maps to $worst distinct " +
          "(event_type, value) pairs — its dedup-order-insensitive oracle is invalid")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Leave a loud per-query marker so a crashed query shows up in the
        // correctness artifact as a red row instead of a silently-missing key
        // (round 8: 30 crashed queries vanished from CORRECTNESS_r08.json).
        val d = new java.io.File(s"$outDir/$name"); d.mkdirs()
        Files.writeString(Paths.get(d.getPath, "_error.txt"),
          s"$name: ${e.getClass.getName}: ${e.getMessage}\n")
      }
      // Same per-query cleanup as Bench: a persisted projection (e.g. the
      // MinHash shingle cache, Dedup.scala) surviving into later queries only
      // competes for storage memory there — cache lifetime is one query.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
