package graft

import org.apache.spark.sql.functions._

import graft.engine.{Cdc, Expectations, Incremental, Merge}
import graft.ext.{Dedup, PQ, Sampling, TextAnalysis}

/** Specs for the round-7 operators: snapshot CDC, chunk-level boilerplate
  * dedup, bigram LM scoring, product quantization, expectations, shard
  * export, and versioned-store time travel. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  // --- Cdc.snapshotDiff ----------------------------------------------------

  test("snapshotDiff: classifies insert/delete/update and drops unchanged rows") {
    val old = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v")
    val nw = Seq((2L, "b", 20L), (3L, "c", 31L), (4L, "d", 40L)).toDF("k", "s", "v")
    val diff = Cdc.snapshotDiff(old, nw, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(1L -> "delete", 3L -> "update", 4L -> "insert"))
  }

  test("snapshotDiff: null-safe value compare — NULL→value is an update, NULL→NULL is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val nw = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val diff = Cdc.snapshotDiff(old, nw, Seq("k")).collect()
    assert(diff.map(_.getLong(0)).toSeq === Seq(2L))
    assert(diff.head.getString(1) === "update")
  }

  // --- Dedup.dropBoilerplateChunks -----------------------------------------

  test("dropBoilerplateChunks: drops the shared chunk everywhere, preserves order") {
    val boiler = "b1 b2 b3 b4" // 4-word chunk planted in all 3 docs
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 x1 x2 x3 x4"),
      (2L, s"v1 v2 v3 v4 $boiler"),
      (3L, s"$boiler w1 w2")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateChunks(docs, width = 4, maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((3L, 2L, "u1 u2 u3 u4 x1 x2 x3 x4")))
    assert(out(2L) === ((2L, 1L, "v1 v2 v3 v4")))
    // doc 3: remainder chunk "w1 w2" is unique → kept
    assert(out(3L) === ((2L, 1L, "w1 w2")))
  }

  test("dropBoilerplateChunks: nothing dropped when no chunk exceeds the frequency cap") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateChunks(docs, width = 3, maxDocFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(1L -> "a b c d e", 2L -> "f g h i j"))
  }

  // --- TextAnalysis.bigramModelScore ---------------------------------------

  test("bigramModelScore: known/unknown split and frequency mass are exact") {
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    // model: {"the cat": 2, "cat sat": 1, "cat ran": 1}
    val tgt = Seq((10L, "the cat sat"), (11L, "a dog"), (12L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramModelScore(ref, tgt)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L) === ((2L, 2L, 3L))) // "the cat"(2) + "cat sat"(1)
    assert(out(11L) === ((1L, 0L, 0L))) // "a dog" unseen
    assert(!out.contains(12L)) // one-word doc: no bigrams, no row
  }

  // --- PQ ------------------------------------------------------------------

  test("PQ: codes are within range, deterministic, and ADC search finds planted neighbors") {
    // 3 well-separated clusters in 8 dims, 30 vectors each
    val vecs = (0 until 90).map { i =>
      val c = i % 3
      val base = Array.fill(8)(0.0f)
      base(c * 2) = 10.0f; base(c * 2 + 1) = 10.0f
      // small deterministic jitter
      val v = base.zipWithIndex.map { case (x, j) => x + ((i * 7 + j * 3) % 5) * 0.1f }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val books = PQ.train(vecs, m = 4, k = 4, iters = 2)
    assert(books.size === 4 && books.forall(_.size === 4))
    val codes = PQ.encode(vecs, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(cs => cs.size == 4 && cs.forall(c => c >= 0 && c < 4)))
    // same-cluster vectors should share codes more than cross-cluster ones
    val top = PQ.search(vecs, books, queryId = 0, k = 5, rerank = 20).collect()
    assert(top.length === 5)
    // query 0 is in cluster 0 → its neighbors must all be ≡ 0 mod 3
    assert(top.forall(_.getLong(0) % 3 === 0L))
  }

  test("PQ: encoding is invariant under repartitioning") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 13 + j * 5) % 17).toFloat))
    }.toDF("vec_id", "embedding")
    val books = PQ.train(vecs, m = 2, k = 4, iters = 1)
    val a = PQ.encode(vecs, books).collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PQ.encode(vecs.repartition(7), books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b)
  }

  // --- Expectations --------------------------------------------------------

  test("Expectations.report: counts violations (null predicate = violation)") {
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None)).toDF("id", "v")
    val rep = Expectations.report(df, Seq(
        Expectations.Rule("non_negative", col("v") >= 0.0),
        Expectations.Rule("present", col("v").isNotNull)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep("non_negative") === ((3L, 2L))) // -1 fails, NULL fails
    assert(rep("present") === ((3L, 1L)))
  }

  test("Expectations.quarantine: splits on the conjunction of all rules") {
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 500.0)).toDF("id", "v")
    val (ok, bad) = Expectations.quarantine(df, Seq(
      Expectations.Rule("non_negative", col("v") >= 0.0),
      Expectations.Rule("bounded", col("v") <= 400.0)))
    assert(ok.select("id").as[Long].collect().toSet === Set(1L))
    assert(bad.select("id").as[Long].collect().toSet === Set(2L, 3L))
  }

  // --- Sampling.shardForExport ---------------------------------------------

  test("shardForExport: shard is consistent with sort_key, deterministic, and balanced-ish") {
    val docs = (1L to 2000L).toDF("doc_id")
    val sharded = Sampling.shardForExport(docs, col("doc_id"), numShards = 8)
    val rows = sharded.collect()
    assert(rows.forall { r =>
      val k = r.getAs[Long]("sort_key"); val s = r.getAs[Long]("shard")
      k >= 0 && s == (k % 8)
    })
    // deterministic under repartitioning
    val again = Sampling.shardForExport(docs.repartition(11), col("doc_id"), 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val first = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(first === again)
    // md5 uniformity: no shard is more than 2× the mean
    val sizes = rows.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(sizes.max <= 2 * (2000 / 8))
  }

  // --- Versioned time travel ----------------------------------------------

  test("latestUpsertStateBefore reads the pre-update snapshot after later versions commit") {
    withTempDir { dir =>
      val state = s"$dir/state"
      val base = Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      Incremental.commitVersion(base, state, 0L)
      val u1 = Seq((2L, "B2"), (3L, "c")).toDF("k", "s")
      Incremental.commitVersion(
        Merge.upsert(Incremental.latestUpsertStateBefore(spark, state, 1L).get, u1, Seq("k"))
          .drop("merge_action"), state, 1L)
      val u2 = Seq((1L, "A3")).toDF("k", "s")
      Incremental.commitVersion(
        Merge.upsert(Incremental.latestUpsertStateBefore(spark, state, 2L).get, u2, Seq("k"))
          .drop("merge_action"), state, 2L)

      def snap(before: Long) =
        Incremental.latestUpsertStateBefore(spark, state, before).get
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snap(1L) === Map(1L -> "a", 2L -> "b"))
      assert(snap(2L) === Map(1L -> "a", 2L -> "B2", 3L -> "c"))
      assert(snap(Long.MaxValue) === Map(1L -> "A3", 2L -> "B2", 3L -> "c"))
    }
  }
}
