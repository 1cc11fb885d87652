package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Isolated per-query timing: runs each named query `reps` times in one session
  * (first iteration shows cold/codegen cost, later ones steady-state). Each rep
  * also reports shuffle bytes WRITTEN (same stage-completion listener as
  * Bench) — the plan-deterministic regression currency.
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <reps> <queryName ...>
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffleWritten = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWritten.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val b0 = shuffleWritten.sum()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Match Bench.runOnce: a rep's persisted projections must not bleed
        // into the next rep's timing. The blocking unpersist also flushes
        // straggler stage events before the byte snapshot.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        val mb = (shuffleWritten.sum() - b0) / 1e6
        f"$dt%.2fs(n=$n,${mb}%.1fMB)"
      }
      println(s"[time] $name: ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
