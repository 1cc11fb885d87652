package graft.tools

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** A/B variants of one CC round to find what makes count() slow.
  * Usage: runMain graft.tools.ProfileCC2 [nEdges]
  */
object ProfileCC2 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    def edges = spark.range(n)
      .select((col("id") - col("id") % 4).as("id_a"), (col("id") + 1).as("id_b"))
      .where(col("id") % 4 =!= 3)

    def mkSymLabels(): (DataFrame, DataFrame) = {
      val sym = edges.select(explode(array(
          struct(col("id_a").as("src"), col("id_b").as("dst")),
          struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .distinct().persist(level)
      sym.count()
      val labels = sym.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("component")).persist(level)
      labels.count()
      (sym, labels)
    }

    def round(sym: DataFrame, labels: DataFrame): DataFrame = {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"), lit(false).as("orig"))
      labels.select(col("id"), col("component"), lit(true).as("orig"))
        .unionByName(viaNeighbor)
        .groupBy("id")
        .agg(min("component").as("component"),
          min(when(col("orig"), col("component"))).as("prev"))
    }

    def clean(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    (1 to 2).foreach { rep =>
      println(s"[prof] === rep $rep ===")
      // A: observe + persist (current implementation shape)
      locally { val (sym, labels) = mkSymLabels()
        timed("A observe+persist") {
          val obs = Observation(s"a_$rep")
          val next = round(sym, labels)
            .observe(obs, sum(when(col("component") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
            .select(col("id"), col("component")).persist(level)
          next.count(); obs.get
        }
        clean() }
      // B: persist, no observe; changed via second agg job
      locally { val (sym, labels) = mkSymLabels()
        timed("B persist+aggjob") {
          val next = round(sym, labels).persist(level)
          next.count()
          next.agg(sum(when(col("component") =!= col("prev"), 1L).otherwise(0L))).collect()
        }
        clean() }
      // C: observe, no persist
      locally { val (sym, labels) = mkSymLabels()
        timed("C observe only") {
          val obs = Observation(s"c_$rep")
          val next = round(sym, labels)
            .observe(obs, sum(when(col("component") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
            .select(col("id"), col("component"))
          next.count(); obs.get
        }
        clean() }
      // D: bare round, no observe, no persist
      locally { val (sym, labels) = mkSymLabels()
        timed("D bare") { round(sym, labels).count() }
        clean() }
      // E: bare round, AQE off
      locally { spark.conf.set("spark.sql.adaptive.enabled", "false")
        val (sym, labels) = mkSymLabels()
        timed("E bare noAQE") { round(sym, labels).count() }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        clean() }
      // F: observe+persist, AQE off
      locally { spark.conf.set("spark.sql.adaptive.enabled", "false")
        val (sym, labels) = mkSymLabels()
        timed("F obs+persist noAQE") {
          val obs = Observation(s"f_$rep")
          val next = round(sym, labels)
            .observe(obs, sum(when(col("component") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
            .select(col("id"), col("component")).persist(level)
          next.count(); obs.get
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        clean() }
    }
    spark.stop()
  }
}
