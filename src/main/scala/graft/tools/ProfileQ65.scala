package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.ext.Dedup

/** Per-stage timing of q65: edges materialization vs connected-components
  * rounds. Usage: runMain graft.tools.ProfileQ65 <sfDir>
  */
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val pairs = Dedup.minhashNearDuplicatesPortable(
        SparkEntry.docsWithPlantedNearDups(spark, sfDir), threshold = 0.5)
      .select(col("id_a"), col("id_b"))
    val cached = timed("edges materialize") {
      val c = pairs.persist(); println(s"[prof] n_edges=${c.count()}"); c
    }

    // Replicate the CC loop with per-round timing.
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = cached.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(level)
    timed("sym materialize") { println(s"[prof] n_sym=${sym.count()}") }
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .persist(level)
    timed("labels0 materialize") { println(s"[prof] n_vertices=${labels.count()}") }
    var iter = 0
    var converged = false
    while (!converged && iter < 20) {
      val changed = timed(s"round $iter") {
        val viaNeighbor = sym
          .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
          .select(col("src").as("id"), col("component"), lit(false).as("orig"))
        val merged = labels.select(col("id"), col("component"), lit(true).as("orig"))
          .unionByName(viaNeighbor)
          .groupBy("id")
          .agg(min("component").as("component"),
            min(when(col("orig"), col("component"))).as("prev"))
        val obs = org.apache.spark.sql.Observation(s"ccp_round_$iter")
        val next = merged
          .observe(obs, sum(when(col("component") =!= col("prev"), 1L)
            .otherwise(0L)).as("changed"))
          .select(col("id"), col("component"))
          .persist(level)
        next.count()
        labels.unpersist(blocking = false)
        labels = next
        obs.get("changed") match {
          case null => 0L
          case l: java.lang.Long => l.longValue()
          case other => other.toString.toLong
        }
      }
      println(s"[prof]   changed=$changed")
      converged = changed == 0L
      iter += 1
    }
    spark.stop()
  }
}
