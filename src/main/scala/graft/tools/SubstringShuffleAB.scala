package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B shuffle-byte meter for the substring-dedup hash-key diet (round-13
  * PERF evidence): shape A is the round-12 form — the corpus-wide duplicate
  * test keyed by the RAW length-30 window string; shape B is the shipped
  * form — the same test keyed by `Md5Prefix60(window)` (8-byte long), with
  * the window string re-derived from the doc text for candidates only.
  * Both run over the real sf documents table and must agree on the final
  * span mass; the interesting number is shuffle bytes written on the
  * corpus-wide exchange, which at 100 TB is the dominant cost.
  *
  * Usage: runMain graft.tools.SubstringShuffleAB <sfDir> [minLen]
  */
object SubstringShuffleAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val minLen = if (args.length > 1) args(1).toInt else 30
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val written = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        written.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("doc"), col("text").as("__t"))
      .where(length(col("__t")) >= minLen)

    def windows = docs
      .select(col("doc"), col("__t"),
        explode(expr(s"sequence(1L, CAST(length(__t) - ${minLen - 1} AS BIGINT))"))
          .as("pos"))
      .select(col("doc"), col("pos"),
        expr(s"substring(__t, CAST(pos AS INT), $minLen)").as("g"))

    def measure(label: String)(mass: => Long): Unit = {
      written.reset()
      val t0 = System.nanoTime()
      val m = mass
      val dt = (System.nanoTime() - t0) / 1e9
      var last = -1L
      while (last != written.sum()) { last = written.sum(); Thread.sleep(300) }
      println(f"[ab] $label: $dt%.2fs covered_mass=$m shuffle_written=${written.sum()}%,d bytes")
      spark.catalog.clearCache()
    }

    // Shape A (round-12): ONE count-over-window keyed by the RAW window
    // string — the 30-char key is the shuffle payload of the corpus-wide
    // exchange.
    measure("A raw-string key") {
      val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      windows
        .withColumn("__n", count(lit(1)).over(wg))
        .where(col("__n") >= 2L)
        .agg(count(lit(1))).head().getLong(0)
    }

    // Shape B (shipped): the corpus-wide exchange carries (doc, pos,
    // md5Prefix60(g)) — 8-byte key, no string; candidates join back to the
    // doc text (packed, one row per doc) and the exact string test runs on
    // the re-derived window. Same covered mass (superset + exact verify).
    measure("B md5-60 key") {
      import graft.functions.HashFunctions.md5Prefix60
      val wh = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
      val cand = windows
        .select(col("doc"), col("pos"), md5Prefix60(col("g")).as("__h"))
        .withColumn("__n", count(lit(1)).over(wh))
        .where(col("__n") >= 2L)
        .select(col("doc"), col("pos"))
      val candByDoc = cand.groupBy(col("doc"))
        .agg(collect_list(col("pos")).as("__ps"))
      val verified = docs.join(candByDoc, Seq("doc"))
        .select(col("doc"), col("__t"), explode(col("__ps")).as("pos"))
        .select(col("doc"), col("pos"),
          expr(s"substring(__t, CAST(pos AS INT), $minLen)").as("g"))
      val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      verified
        .withColumn("__n", count(lit(1)).over(wg))
        .where(col("__n") >= 2L)
        .agg(count(lit(1))).head().getLong(0)
    }
    spark.stop()
  }
}
