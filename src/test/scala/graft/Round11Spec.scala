package graft

import org.apache.spark.sql.functions._
import graft.engine.{Incremental, Layout}
import graft.ext.{Itemsets, Sampling}

/** Round-11 hardening: commitTransaction claim-before-stage, the
  * negativeSample id-range guard, empty-subtree date-spec reads, and the
  * shared hub-capped basket-pair builder. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def messages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).toSeq

  // ------------------------------- commitTransaction claims before staging

  test("commitTransaction: a standing claim blocks a second committer BEFORE it stages") {
    val a = Seq(("x", 1L)).toDF("k", "v")
    withTempDir { dir =>
      val st = s"$dir/txn"
      // Simulate a concurrent committer that claimed v=0 and then crashed
      // (or is still staging): only its claim file exists.
      val fs = new org.apache.hadoop.fs.Path(st)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$st/_txn"))
      fs.create(new org.apache.hadoop.fs.Path(s"$st/_txn/v=0._claim"), false).close()
      intercept[java.util.ConcurrentModificationException] {
        Incremental.commitTransaction(Map("a" -> a), st, 0L)
      }
      // The loser must not have staged ANY table bytes — the stage-first
      // hazard was exactly that a loser's mode=overwrite stage could shred
      // the winner's in-flight files.
      assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$st/a")),
        "losing committer staged table data despite losing the claim")
      // A claimed-but-unpublished version stays invisible to readers and
      // does not corrupt the claim-file-aware version listing.
      assert(Incremental.latestTxn(spark, st) === None)
      // The conventional recovery: commit at the NEXT version.
      Incremental.commitTransaction(Map("a" -> a), st, 1L)
      assert(Incremental.latestTxn(spark, st) === Some(1L))
      assert(Incremental.readTableAtLatestTxn(spark, st, "a").count() === 1L)
    }
  }

  test("commitTransaction: claim files never parse as published versions") {
    val a = Seq(("x", 1L)).toDF("k", "v")
    withTempDir { dir =>
      val st = s"$dir/txn"
      Incremental.commitTransaction(Map("a" -> a), st, 3L)
      // the claim for v=3 sits alongside the marker; latestTxn must list 3
      // (not throw on "3._claim", not report a phantom version)
      assert(Incremental.latestTxn(spark, st) === Some(3L))
    }
  }

  // ------------------------------- negativeSample id-range guard

  test("negativeSample: an item id at 2^31 raises loudly instead of corrupting the pack") {
    val pos = Seq((1L, 5L)).toDF("u", "i")
    val items = Seq(5L, 6L, 2147483648L).toDF("item")
    val e = intercept[Exception] {
      Sampling.negativeSample(pos, "u", "i", items, "item",
        k = 1, buckets = 2, salt = "s").collect()
    }
    assert(messages(e).exists(_.contains("outside [0, 2^31)")), messages(e).mkString(" | "))
  }

  test("negativeSample: in-range ids still sample and never collide with positives") {
    val pos = Seq((1L, 5L), (1L, 6L), (2L, 5L)).toDF("u", "i")
    val items = Seq(5L, 6L, 7L, 8L, 9L).toDF("item")
    val out = Sampling.negativeSample(pos, "u", "i", items, "item",
      k = 4, buckets = 2, salt = "s").collect()
    assert(out.nonEmpty)
    val posSet = Set((1L, 5L), (1L, 6L), (2L, 5L))
    out.foreach { r =>
      assert(!posSet.contains((r.getLong(0), r.getLong(3))),
        s"negative ${r.getLong(3)} is a positive for user ${r.getLong(0)}")
      assert(r.getLong(3) >= 5L && r.getLong(3) <= 9L)
    }
  }

  // ------------------------------- date-spec evolution with one-sided data

  test("readDateSpecEvolution: all data before the cutover leaves spec=year empty but readable") {
    val df = Seq(("2020-01-15", 1L), ("2020-03-02", 2L)).toDF("ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    withTempDir { dir =>
      Layout.writeDateSpecEvolution(df, col("ts"), cutover = "2021-01-01", root = dir)
      val out = Layout.readDateSpecEvolution(spark, dir, "2020-01-01", "2020-12-31")
      assert(out.select("v").as[Long].collect().sorted === Seq(1L, 2L))
    }
  }

  test("readDateSpecEvolution: all data after the cutover leaves spec=month empty but readable") {
    val df = Seq(("2021-05-15", 3L), ("2022-07-02", 4L)).toDF("ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    withTempDir { dir =>
      Layout.writeDateSpecEvolution(df, col("ts"), cutover = "2021-01-01", root = dir)
      val out = Layout.readDateSpecEvolution(spark, dir, "2021-01-01", "2022-12-31")
      assert(out.select("v").as[Long].collect().sorted === Seq(3L, 4L))
    }
  }

  // ------------------------------- shared hub-capped pair builder

  test("pairCounts: an over-cap basket contributes nothing; normal baskets count") {
    // basket 1: items 1..5 (over the cap of 4 → dropped whole);
    // basket 2 and 3: items {1,2} twice → pair (1,2) counted twice.
    val rows = (1L to 5L).map(i => (1L, i)) ++
      Seq((2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L))
    val out = Itemsets.pairCounts(rows.toDF("b", "i"), "b", "i", maxBasketSize = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out === Set((1L, 2L, 2L)),
      "over-cap basket leaked pairs or normal baskets miscounted")
  }

  test("pairCounts: duplicate item rows within a basket collapse before sizing") {
    // basket 10 lists item 7 three times plus item 8 — 2 DISTINCT items,
    // under a cap of 2; the pair counts once.
    val rows = Seq((10L, 7L), (10L, 7L), (10L, 7L), (10L, 8L))
    val out = Itemsets.pairCounts(rows.toDF("b", "i"), "b", "i", maxBasketSize = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((7L, 8L, 1L)))
  }
}
