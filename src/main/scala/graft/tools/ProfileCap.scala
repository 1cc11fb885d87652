package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B for the hub-basket cap (q242/q245 path): wall time AND
  * shuffle bytes of the pair build under (a) no cap, (b) the round-11/12
  * inner-join-back cap (count-over-window width), (c) the shipped broadcast
  * anti-join cap. Shuffle bytes are environment-independent — the honest
  * comparison when the box is contended.
  *
  * Usage: runMain graft.tools.ProfileCap <sfDir>
  */
object ProfileCap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
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
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")

    def time(label: String)(df: => DataFrame): Unit =
      (1 to 3).foreach { i =>
        written.reset()
        val t0 = System.nanoTime()
        val n = df.count()
        val dt = (System.nanoTime() - t0) / 1e9
        var last = -1L
        while (last != written.sum()) { last = written.sum(); Thread.sleep(300) }
        println(f"[cap] $label rep$i: $dt%.2fs n=$n shuffle=${written.sum()}%,d B")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      }

    def pairsFrom(it: DataFrame): DataFrame =
      it.as("a").join(it.as("x"), expr("a.b = x.b AND a.i < x.i"))
        .groupBy(col("a.i").as("p1"), col("x.i").as("p2"))
        .agg(count(lit(1)).as("n"))

    val rawDef = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i")).distinct()

    time("uncapped") { pairsFrom(rawDef) }

    // round-11/12 shape: COUNT(*) OVER (PARTITION BY basket) — a second
    // full-width exchange of the membership table, unconditionally
    time("join-back (old)") {
      val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
      pairsFrom(rawDef.withColumn("__bs", count(lit(1)).over(wb))
        .where(col("__bs") <= 1000L).drop("__bs"))
    }

    time("anti-join (shipped)") {
      val overCap = rawDef.groupBy(col("b")).agg(count(lit(1)).as("__bs"))
        .where(col("__bs") > 1000L).select(col("b"))
      pairsFrom(rawDef.join(broadcast(overCap), Seq("b"), "left_anti"))
    }

    // ONE exchange by the basket key serves dedup, the cap window, AND both
    // sides of the downstream self-join (hashpartitioning(b) satisfies
    // ClusteredDistribution(b,i) and the b-keyed join)
    time("repartition-b once (v3)") {
      val byB = li.select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .repartition(col("b"))
        .dropDuplicates("b", "i")
      val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
      pairsFrom(byB.withColumn("__bs", count(lit(1)).over(wb))
        .where(col("__bs") <= 1000L).drop("__bs"))
    }
    spark.stop()
  }
}
