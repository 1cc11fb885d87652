package graft

import org.apache.spark.sql.functions._

import graft.engine.{Layout, Skipping}

/** File-level data-skipping stats: correctness (pruned ≡ full-scan filter),
  * actual pruning on a clustered layout, null handling, and stats-dir
  * invisibility to normal reads. */
class SkippingSpec extends SparkSpec {

  test("readRange equals full-scan filter and actually prunes files on a clustered layout") {
    import spark.implicits._
    withTempDir { dir =>
      val table = s"$dir/t"
      val df = (0L until 10000L).map(i => (i, i % 97, s"v$i")).toDF("k", "d", "v")
      // Range-clustered on k → tight per-file [min_k, max_k] spans.
      Layout.zorderBy(df, "k", "d", 8).write.parquet(table)
      Skipping.writeStats(spark, table, Seq("k", "d"))

      val nFiles = Skipping.stats(spark, table).count()
      assert(nFiles >= 4, s"expected multiple files, got $nFiles")

      val pruned = Skipping.readRange(spark, table, "k", 100L, 300L)
      val full = spark.read.parquet(table).filter(col("k") >= 100L && col("k") <= 300L)
      assert(pruned.sort("k").collect().toSeq == full.sort("k").collect().toSeq)

      val kept = Skipping.candidateFiles(spark, table, "k", 100L, 300L)
      assert(kept.nonEmpty && kept.size < nFiles,
        s"no pruning: kept ${kept.size} of $nFiles files for a narrow k-range")

      // Out-of-domain range: zero candidates, empty result, schema preserved.
      val none = Skipping.readRange(spark, table, "k", 1000000L, 2000000L)
      assert(none.count() == 0L)
      assert(none.columns.toSeq == Seq("k", "d", "v"))
      assert(Skipping.candidateFiles(spark, table, "k", 1000000L, 2000000L).isEmpty)

      // 2-D conjunctive pruning over the z-order curve: equals the full
      // filter, and the intersection keeps no more files than either
      // single-column candidate set.
      val ranges = Seq[(String, Any, Any)](("k", 100L, 3000L), ("d", 10L, 30L))
      val pruned2 = Skipping.readRanges(spark, table, ranges)
      val full2 = spark.read.parquet(table)
        .filter(col("k").between(100L, 3000L) && col("d").between(10L, 30L))
      assert(pruned2.sort("k").collect().toSeq == full2.sort("k").collect().toSeq)
    }
  }

  test("all-null files are skipped for range predicates; nulls_ counts recorded") {
    import spark.implicits._
    withTempDir { dir =>
      val table = s"$dir/t"
      val withNulls = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"))
        .toDF("k", "v")
      val allNulls = Seq[(java.lang.Long, String)]((null, "x"), (null, "y"))
        .toDF("k", "v")
      withNulls.coalesce(1).write.parquet(table)
      allNulls.coalesce(1).write.mode("append").parquet(table)
      Skipping.writeStats(spark, table, Seq("k"))

      val st = Skipping.stats(spark, table).sort("nulls_k").collect()
      assert(st.length == 2)
      assert(st.map(_.getAs[Long]("nulls_k")).toSeq == Seq(0L, 2L))

      // The all-null file can never satisfy a range predicate — skipped.
      val kept = Skipping.candidateFiles(spark, table, "k", 0L, 10L)
      assert(kept.size == 1)
      assert(Skipping.readRange(spark, table, "k", 0L, 10L).count() == 2L)

      // Null-seeking read: only the file that HAS nulls is opened.
      val nulls = Skipping.readNulls(spark, table, "k")
      assert(nulls.count() == 2L)
      assert(nulls.select("v").collect().map(_.getString(0)).toSet == Set("x", "y"))
    }
  }

  test("appending files after writeStats fails pruned reads loudly") {
    import spark.implicits._
    withTempDir { dir =>
      val table = s"$dir/t"
      (0 until 100).map(i => (i.toLong, s"r$i")).toDF("k", "v")
        .coalesce(1).write.parquet(table)
      Skipping.writeStats(spark, table, Seq("k"))
      assert(Skipping.readRange(spark, table, "k", 0L, 10L).count() == 11L)

      // New rows land in a file the stats never saw: without the freshness
      // check the pruned read would silently omit them.
      Seq((5L, "late")).toDF("k", "v").coalesce(1).write.mode("append").parquet(table)
      val ex = intercept[IllegalStateException] {
        Skipping.readRange(spark, table, "k", 0L, 10L).count()
      }
      assert(ex.getMessage.contains("stale"))
      assert(intercept[IllegalStateException] {
        Skipping.readNulls(spark, table, "k").count()
      }.getMessage.contains("stale"))

      // Re-running writeStats repairs the manifest.
      Skipping.writeStats(spark, table, Seq("k"))
      assert(Skipping.readRange(spark, table, "k", 0L, 10L).count() == 12L)
    }
  }

  test("table paths with URL-encodable characters round-trip through the stats") {
    import spark.implicits._
    withTempDir { dir =>
      // input_file_name() returns a URL-encoded URI ("%20" for the space);
      // pruning must decode before comparing listings / re-opening files.
      val table = s"$dir/with space/t"
      (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
        .repartitionByRange(4, col("k")).write.parquet(table)
      Skipping.writeStats(spark, table, Seq("k"))

      val nFiles = Skipping.stats(spark, table).count()
      val kept = Skipping.candidateFiles(spark, table, "k", 0L, 100L)
      assert(kept.nonEmpty && kept.size < nFiles,
        s"no pruning under encoded path: kept ${kept.size} of $nFiles")
      assert(kept.forall(f => f.contains("with space") && !f.contains("%20")),
        s"candidate paths must be decoded, got: ${kept.take(2).mkString(", ")}")
      val pruned = Skipping.readRange(spark, table, "k", 0L, 100L)
      assert(pruned.count() == 101L)
    }
  }

  test("stats dir is invisible to normal table reads") {
    import spark.implicits._
    withTempDir { dir =>
      val table = s"$dir/t"
      (0 until 100).map(i => (i, s"r$i")).toDF("k", "v").write.parquet(table)
      val before = spark.read.parquet(table).count()
      Skipping.writeStats(spark, table, Seq("k"))
      assert(spark.read.parquet(table).count() == before,
        "_graft_stats leaked into the table's own file listing")
    }
  }
}
