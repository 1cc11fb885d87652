package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Isolated per-query timing: runs each named query `reps` times in one session
  * (first iteration shows cold/codegen cost, later ones steady-state).
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
    names.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Match Bench.runOnce: a rep's persisted projections must not bleed
        // into the next rep's timing.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        f"$dt%.2fs(n=$n)"
      }
      println(s"[time] $name: ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
