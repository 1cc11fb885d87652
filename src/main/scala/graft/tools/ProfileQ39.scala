package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Stage-by-stage timing of the q39 portable near-dedup pipeline, to locate
  * where wall-time goes before optimizing. Throwaway diagnostic.
  */
object ProfileQ39 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val all = docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s*", "").as("text")))

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val sh = time("shingles (count)") {
        val s = Dedup.shingleSets(all, 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        s.count(); s
      }
      val sigs = time("signatures") {
        val s = Dedup.minhashSignaturesPortable(sh); s.count(); s
      }
      val pairs = time("band buckets + candidate join + distinct") {
        val buckets = sigs.select(col("doc_id"),
          posexplode(Dedup.bandKeys(col("sig"), Dedup.PortableNumHashes,
            Dedup.PortableBands)).as(Seq("band", "band_key")))
        val a = buckets.as("a"); val b = buckets.as("b")
        val p = a.join(b,
            col("a.band") === col("b.band") &&
              col("a.band_key") === col("b.band_key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
        println(s"  candidates=${p.count()}"); p
      }
      time("jaccard verify") {
        Dedup.pairJaccardFromShingles(pairs, sh, "doc_id")
          .filter(col("jaccard") >= 0.5).count()
      }
      time("full q39 (end-to-end)") {
        Dedup.removeNearDuplicatesPortable(all, threshold = 0.5).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
