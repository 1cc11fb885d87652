package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the SCC forward-coloring frontier (round-15 item 1): a
  * LONG-TAIL fixture — one root feeding `chains` chains of `len` nodes —
  * where min-label 0 stabilizes progressively outward, so a frontier-
  * limited propagation joins only the moving wavefront (~`chains` rows per
  * inner round) while the pre-round-15 full-table join re-joined all
  * ~`chains·len` colors against all edges every round. One outer round
  * (`maxRounds = 1`) isolates the forward phase + one backward drain.
  *
  * Usage: runMain graft.tools.SccFrontierProbe [chains] [len]
  * Prints wall seconds, total shuffle bytes written, and job count — run
  * it on two builds (old/new Graph.scala) for the PERF note.
  */
object SccFrontierProbe {
  def main(args: Array[String]): Unit = {
    val chains = if (args.length > 0) args(0).toInt else 100
    val len = if (args.length > 1) args(1).toInt else 100
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
    // lattice: layer i of every chain points at layer i+1 of `fanout`
    // chains — long diameter (len) with |E| = fanout·|V|, the regime where
    // the forward aggregate's input (all edges × colors vs frontier
    // out-edges) dominates the node-table rewrite
    val fanout = if (args.length > 2) args(2).toInt else 1
    import spark.implicits._
    val edges = (0 until chains).flatMap { c =>
      (0 until fanout).map(f =>
        (0L, ((c + f) % chains).toLong * 100000L + 1L)) ++
        (1 until len).flatMap { i =>
          (0 until fanout).map(f =>
            (c.toLong * 100000L + i,
              ((c + f) % chains).toLong * 100000L + i + 1))
        }
    }.toDF("src", "dst")
    val t0 = System.nanoTime()
    val n = graft.ext.Graph.stronglyConnectedComponents(
      edges, maxRounds = 1, maxPropRounds = len + 20).count()
    val dt = (System.nanoTime() - t0) / 1e9
    // settle async listener events
    var last = -1L
    while (last != bytes.sum()) { last = bytes.sum(); Thread.sleep(300) }
    println(f"[scc-probe] chains=$chains len=$len found=$n wall=$dt%.2fs " +
      f"shuffle_written=${bytes.sum()}%,d bytes jobs=${jobs.sum()}")
    spark.stop()
  }
}
