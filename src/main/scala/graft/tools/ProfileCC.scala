package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation

/** Micro-benchmark: connectedComponents loop over synthetic edges with NO
  * expensive upstream — isolates per-round loop overhead (count vs obs.get)
  * from the q65 MinHash lineage.
  * Usage: runMain graft.tools.ProfileCC [nEdges]
  */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Chains of length 4: forces ~3 rounds of propagation.
    val edges = spark.range(n)
      .select((col("id") - col("id") % 4).as("id_a"), (col("id") + 1).as("id_b"))
      .where(col("id") % 4 =!= 3)

    (1 to 3).foreach { rep =>
      println(s"[prof] === rep $rep ===")
      val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      var t = System.nanoTime()
      val sym = edges.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct()
        .persist(level)
      sym.count()
      println(f"[prof] sym: ${(System.nanoTime() - t) / 1e9}%.2fs")
      t = System.nanoTime()
      var labels = sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("component"))
        .persist(level)
      labels.count()
      println(f"[prof] labels0: ${(System.nanoTime() - t) / 1e9}%.2fs")
      var iter = 0
      var converged = false
      val tAll = System.nanoTime()
      while (!converged && iter < 20) {
        val viaNeighbor = sym
          .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
          .select(col("src").as("id"), col("component"), lit(false).as("orig"))
        val merged = labels.select(col("id"), col("component"), lit(true).as("orig"))
          .unionByName(viaNeighbor)
          .groupBy("id")
          .agg(min("component").as("component"),
            min(when(col("orig"), col("component"))).as("prev"))
        val obs = Observation(s"ccp_${rep}_$iter")
        val next = merged
          .observe(obs, sum(when(col("component") =!= col("prev"), 1L)
            .otherwise(0L)).as("changed"))
          .select(col("id"), col("component"))
          .persist(level)
        val t0 = System.nanoTime()
        next.count()
        val tCount = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val changed = obs.get("changed") match {
          case null => 0L
          case l: java.lang.Long => l.longValue()
          case other => other.toString.toLong
        }
        val tObs = (System.nanoTime() - t1) / 1e9
        println(f"[prof] round $iter: count=$tCount%.2fs obs.get=$tObs%.2fs changed=$changed")
        labels.unpersist(blocking = false)
        labels = next
        converged = changed == 0L
        iter += 1
      }
      println(f"[prof] rep total: ${(System.nanoTime() - tAll) / 1e9}%.2fs")
      sym.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
