package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the graph-loop frame discipline (round 16).
  *
  * Questions, each measured on a 10×5-cycle chain (the q393 fixture class):
  *  1. Does `Dataset.localCheckpoint(eager = true)` PRESERVE the frame's
  *     outputPartitioning in Spark 4.1 (the docs say LogicalRDD carries it),
  *     i.e. does a subsequent same-key join/aggregate skip its exchange?
  *     (PERF.md's round-15 probe said no for the raw-RDD path —
  *     `createDataFrame(df.rdd, schema)` — which is what the loops use;
  *     the DATASET-level checkpoint is the untested alternative.)
  *  2. How many Spark JOBS does one CC round cost under AQE via the raw-RDD
  *     rebind vs via Dataset.localCheckpoint vs with AQE off?
  *
  * Usage: runMain graft.tools.LoopFrameProbe
  */
object LoopFrameProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.add(1L)
    })

    // the q393 chain fixture: 10 five-node cycles + connectors
    val cyc = spark.range(50).select(
      expr("(id div 5) * 10 + id % 5").as("id_a"),
      expr("(id div 5) * 10 + (id % 5 + 1) % 5").as("id_b"))
    val conn = spark.range(9).select(
      expr("id * 10 + 2").as("id_a"), expr("(id + 1) * 10").as("id_b"))
    val edges = cyc.unionByName(conn)

    val sym = edges.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst")).dropDuplicates("src", "dst")
      .persist()
    sym.count()

    // -------- Q1: partitioning preservation --------
    val lab0 = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .select(col("src").as("id"), col("component"))

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      val s = df.queryExecution.executedPlan.toString
      "Exchange".r.findAllIn(s).length
    }

    // (a) raw-RDD rebind (current loop discipline)
    val viaRdd = {
      val r = lab0.repartition(col("id")).rdd
      r.localCheckpoint(); r.count()
      spark.createDataFrame(r, lab0.schema)
    }
    // (b) Dataset.localCheckpoint
    val viaDs = lab0.repartition(col("id")).localCheckpoint(true)

    def roundPlan(labels: org.apache.spark.sql.DataFrame) = {
      val via = sym
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"), lit(false).as("orig"))
      labels.select(col("id"), col("component"), lit(true).as("orig"))
        .unionByName(via)
        .groupBy("id")
        .agg(min("component").as("component"),
          min(when(col("orig"), col("component"))).as("prev"))
    }
    println(s"[probe] exchanges in one CC round, raw-RDD rebind: ${exchanges(roundPlan(viaRdd))}")
    println(s"[probe] exchanges in one CC round, Dataset.localCheckpoint: ${exchanges(roundPlan(viaDs))}")
    println(s"[probe] viaDs plan:\n${roundPlan(viaDs).queryExecution.executedPlan.toString.take(2500)}")

    // -------- Q2: jobs per round, three disciplines --------
    def ccJobs(tag: String, pin: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime(); val j0 = jobs.sum()
      var labels = pin(lab0.repartition(col("id")))
      var changed = 1L; var iter = 0
      while (changed > 0 && iter < 60) {
        iter += 1
        val merged = roundPlan(labels)
        val next = merged.select(col("id"), col("component"),
          (col("component") =!= col("prev")).as("__chg"))
        val pinned = pin(next)
        changed = pinned.where(col("__chg")).count()
        labels = pinned.select(col("id"), col("component"))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $tag%-28s rounds=$iter jobs=${jobs.sum() - j0} wall=$dt%.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(r => if (r.id != sym.rdd.id) r.unpersist(true))
    }

    ccJobs("raw-RDD rebind + AQE", { df =>
      val r = df.rdd; r.localCheckpoint()
      val out = spark.createDataFrame(r, df.schema); out
    })
    ccJobs("Dataset.localCheckpoint", _.localCheckpoint(true))

    // -------- Q3: the real operator (post pointer-jump) --------
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime(); val j0 = jobs.sum()
      val n = graft.ext.Graph.connectedComponents(edges,
        maxIter = 40, requireConverged = true).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] Graph.connectedComponents rep$rep: rows=$n jobs=${jobs.sum() - j0} wall=$dt%.2fs")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    spark.stop()
  }
}
