package graft

import org.apache.spark.sql.functions._

import graft.engine.{Profile, Skipping}
import graft.ext.{Dedup, Packing, Sampling, TextAnalysis}

/** Specs for the round-7 operators: sequence packing, cross-corpus dedup,
  * repetition stats, balanced sampling, profiling, and the bloom file index. */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Packing -------------------------------------------------------------

  test("packByBudget: bins respect the budget boundary rule and are exhaustive") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .withColumn("tok", (col("doc_id") % 7 + 1))
    val packed = Packing.packByBudget(docs, col("doc_id"), col("tok"),
      budget = 10, buckets = 4)
    // Every input row lands in exactly one (bucket, bin).
    assert(packed.count() === 200)
    val fills = Packing.binFill(packed).collect()
    // A bin only exceeds the budget via its LAST doc (running-total rule):
    // bin_tokens - (its max doc) must be < budget.
    val perBin = packed.groupBy("bucket", "bin")
      .agg(sum("tokens").as("bt"), max("tokens").as("mx")).collect()
    perBin.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) < 10,
        s"bin ${r.get(0)}/${r.get(1)} violates running-total budget rule")
    }
    // Bins within a bucket are contiguous 0..n-1.
    packed.select("bucket", "bin").distinct().collect()
      .groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val bins = rows.map(_.getLong(1)).sorted
        assert(bins === (0L until bins.length).toArray)
      }
    assert(fills.map(_.getLong(3)).sum === packed.agg(sum("tokens")).head.getLong(0))
  }

  test("packByBudget: deterministic under repartitioning") {
    val docs = (1L to 500L).map(i => (i, "w " * (i % 40 + 1).toInt)).toDF("doc_id", "text")
    val a = Packing.packByBudget(docs, col("doc_id"),
      TextAnalysis.tokenCount(col("text")), 64, 8)
      .select("doc_id", "bucket", "bin").collect().map(_.toSeq).toSet
    val b = Packing.packByBudget(docs.repartition(13), col("doc_id"),
      TextAnalysis.tokenCount(col("text")), 64, 8)
      .select("doc_id", "bucket", "bin").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("packByBudget: oversized doc overflows its own bin, neighbors unaffected") {
    val docs = Seq((1L, 5L), (2L, 100L), (3L, 5L)).toDF("doc_id", "tok")
    val packed = Packing.packByBudget(docs, col("doc_id"), col("tok"),
      budget = 10, buckets = 1).orderBy("doc_id").collect()
    val bins = packed.map(r => r.getAs[Long]("bin"))
    assert(bins(0) === 0L)       // 5 tokens, starts bin 0
    assert(bins(1) === 0L)       // starts at offset 5, still bin 0, overflows it
    assert(bins(2) === 10L)      // starts at offset 105 -> bin 10: fresh bin
  }

  // --- Cross-corpus dedup --------------------------------------------------

  test("crossCorpusNearDuplicates finds planted cross matches only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog in the misty morning"),
      (2L, "completely different text about distributed query engines and shuffles"),
      (3L, "a third document with its own unique words and phrasing style")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "quick brown fox jumps over the lazy dog in the misty morning"), // near-dup of 1
      (11L, "totally novel content that matches nothing in the corpus at all")
    ).toDF("doc_id", "text")
    val out = Dedup.crossCorpusNearDuplicatesPortable(corpus, batch, threshold = 0.5)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 10L)))
    // An exact copy scores jaccard 1.0.
    val exact = Dedup.crossCorpusNearDuplicatesPortable(
      corpus, corpus.select(col("doc_id") + 100 as "doc_id", col("text")), 0.9)
    assert(exact.count() === 3)
    assert(exact.agg(min("jaccard")).head.getDouble(0) === 1.0)
  }

  // --- Repetition stats ----------------------------------------------------

  test("repetitionStats counts words, distinct words, top word exactly") {
    val docs = Seq(
      (1L, "spam spam spam ham"),
      (2L, "all words here differ")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1L) === ((4L, 2L, 3L)))
    assert(m(2L) === ((4L, 4L, 1L)))
  }

  test("repetitionStats lowercases before counting") {
    val docs = Seq((1L, "Word word WORD")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((3L, 1L, 3L)))
  }

  // --- Balanced sampling ---------------------------------------------------

  test("balancedSample flattens skewed strata and is a deterministic subset") {
    val rows = (1L to 3000L).map(i => (i, if (i % 10 < 8) "big" else "small"))
    val df = rows.toDF("id", "stratum") // big: 2400, small: 600
    val kept = Sampling.balancedSample(df, col("stratum"), col("id"), target = 100)
    val counts = kept.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~100 per stratum in expectation; allow generous tolerance.
    assert(counts("big") > 50 && counts("big") < 160, s"big=${counts("big")}")
    assert(counts("small") > 50 && counts("small") < 160, s"small=${counts("small")}")
    // Subset + determinism under repartitioning.
    val again = Sampling.balancedSample(df.repartition(7), col("stratum"), col("id"), 100)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ===
      again.select("id").collect().map(_.getLong(0)).toSet)
    // A stratum smaller than target keeps everything (p = 1).
    val tiny = Sampling.balancedSample(df.filter(col("stratum") === "small"),
      col("stratum"), col("id"), target = 1000)
    assert(tiny.count() === 600)
  }

  // --- Profile -------------------------------------------------------------

  test("profile reports nulls, distincts, min/max per column in long format") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None), (None, Some("c")), (Some(2L), Some("a"))
    ).toDF("k", "s")
    val p = Profile.profile(df, Seq("k", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("k").getLong(1) === 4L)        // n_rows
    assert(p("k").getLong(2) === 1L)        // n_nulls
    assert(p("k").getLong(3) === 2L)        // n_distinct (nulls excluded)
    assert(p("k").getString(4) === "1" && p("k").getString(5) === "2")
    assert(p("s").getLong(2) === 1L)
    assert(p("s").getLong(3) === 2L)
    assert(p("s").getString(4) === "a" && p("s").getString(5) === "c")
  }

  // --- Bloom file index ----------------------------------------------------

  test("bloom index prunes files for point lookups and stays exact") {
    withTempDir { dir =>
      val tbl = s"$dir/t"
      // 8 files clustered by `grp`, probing an UNCLUSTERED key.
      (0L until 8000L).map(i => (i % 8, i, i * 3))
        .toDF("grp", "key", "v")
        .repartition(8, col("grp"))
        .write.parquet(tbl)
      Skipping.writeBloomIndex(spark, tbl, "key", expectedItemsPerFile = 2000)
      val hit = Skipping.readPoint(spark, tbl, "key", 4242L)
      // Exactness: same rows as the full filtered scan.
      val expect = spark.read.parquet(tbl).filter(col("key") === 4242L)
        .collect().map(_.toSeq).toSet
      assert(hit.collect().map(_.toSeq).toSet === expect)
      assert(expect.size === 1)
      // Pruning: key 4242 lives in exactly one grp-file; fpp 0.01 over 8
      // files means the scan should open far fewer than all of them.
      assert(hit.inputFiles.length < 8, s"no pruning: ${hit.inputFiles.length} files")
      // An absent key resolves (usually to zero files) without error.
      assert(Skipping.readPoint(spark, tbl, "key", 999999L).count() === 0)
    }
  }

  test("bloom index detects a stale manifest after append") {
    withTempDir { dir =>
      val tbl = s"$dir/t"
      (0L until 100L).map(i => (i, i)).toDF("key", "v").write.parquet(tbl)
      Skipping.writeBloomIndex(spark, tbl, "key", 1000)
      (100L until 120L).map(i => (i, i)).toDF("key", "v")
        .write.mode("append").parquet(tbl)
      val e = intercept[IllegalStateException] {
        Skipping.readPoint(spark, tbl, "key", 5L).count()
      }
      assert(e.getMessage.contains("stale"))
    }
  }
}
