package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query SHUFFLE-BYTE meter: runs each named query once and reports wall
  * time plus total shuffle bytes WRITTEN across its stages (the write side
  * counts each exchange exactly once; read-side adds remote/local fetch of
  * the same bytes). This is the honest scale currency — a rewrite that
  * halves shuffle bytes halves the dominant cost at 100 TB even when
  * sf0.1 wall-clock barely moves.
  *
  * Usage: runMain graft.tools.ShuffleBytes <sfDir> <queryName ...>
  */
object ShuffleBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val written = new LongAdder
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        written.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    names.foreach { name =>
      written.reset()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are async (the bus drain API is private[spark]);
      // a short settle + stable-reading poll is enough for a one-off meter
      var last = -1L
      while (last != written.sum()) { last = written.sum(); Thread.sleep(300) }
      println(f"[shuffle] $name: $dt%.2fs n=$n shuffle_written=${written.sum()}%,d bytes")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
