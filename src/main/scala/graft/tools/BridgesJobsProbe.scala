package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the bridges loop economics (round-16 item 1): q393's cost
  * was pure per-round scheduler overhead (808 jobs for 0.45 MB of shuffle),
  * so the number that matters is JOBS per fixture, with bytes/wall as the
  * guard that the trim didn't trade them away. Two fixtures spanning the
  * regime:
  *  - deep chain — `cycles` five-node cycles chained by single connectors
  *    (the q393 shape, diameter ≈ 3·cycles): rounds ∝ depth, the
  *    job-overhead-bound worst case;
  *  - shallow star — the same cycles all connected to cycle 0 (the q394
  *    shape, diameter ≈ 6): the converged-fast case that shows the fixed
  *    overhead floor.
  *
  * Usage: runMain graft.tools.BridgesJobsProbe [cycles]
  * Run on two builds (old/new Graph.scala) for the PERF note.
  */
object BridgesJobsProbe {
  def main(args: Array[String]): Unit = {
    val cycles = if (args.length > 0) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new LongAdder
    val jobs = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.add(1L)
    })
    val cyc = spark.range(cycles * 5).select(
      expr("(id div 5) * 10 + id % 5").as("id_a"),
      expr("(id div 5) * 10 + (id % 5 + 1) % 5").as("id_b"))
    def run(name: String, conn: org.apache.spark.sql.DataFrame): Unit = {
      bytes.reset(); jobs.reset()
      val t0 = System.nanoTime()
      val nBr = graft.ext.Graph.bridges(cyc.unionByName(conn),
          maxRounds = cycles * 4 + 10)
        .where(col("is_bridge")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      var last = -1L
      while (last != bytes.sum()) { last = bytes.sum(); Thread.sleep(300) }
      println(f"[bridges-probe] fixture=$name cycles=$cycles bridges=$nBr " +
        f"wall=$dt%.2fs shuffle_written=${bytes.sum()}%,d bytes " +
        f"jobs=${jobs.sum()}")
    }
    run("deep-chain", spark.range(cycles - 1).select(
      expr("id * 10 + 2").as("id_a"), expr("(id + 1) * 10").as("id_b")))
    run("shallow-star", spark.range(cycles - 1).select(
      lit(2L).as("id_a"), expr("(id + 1) * 10").as("id_b")))
    spark.stop()
  }
}
