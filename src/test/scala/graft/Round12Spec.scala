package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-12 first tranche: the incremental-connected-components fold proof
  * (moved OUT of q321's benched path per the round-11 verdict) and the
  * mixtureQuotas weight-contract guards. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------- Graph.incrementalComponents

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select(col("id"), col("component")).as[(Long, Long)].collect().toMap

  test("incrementalComponents: fold over batches equals one-shot CC node for node") {
    // A deliberately adversarial merge pattern: batch 1 builds separate
    // components {1,2,3}, {10,11}, a path {20..25}, and isolated pair
    // {40,41}; batch 2 then (a) BRIDGES two prior components (3-10),
    // (b) extends a path with brand-new nodes (25-26, 26-27), (c) adds a
    // component of only-new nodes (50-51), and (d) re-asserts an edge that
    // changes nothing (1-2).
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (22L, 23L), (23L, 24L), (24L, 25L), (40L, 41L)).toDF("id_a", "id_b")
    val b2 = Seq((3L, 10L), (25L, 26L), (26L, 27L), (50L, 51L), (1L, 2L))
      .toDF("id_a", "id_b")
    val inc = labelMap(Graph.incrementalComponents(Graph.connectedComponents(b1), b2))
    val oneShot = labelMap(Graph.connectedComponents(b1.unionByName(b2)))
    assert(inc === oneShot, s"fold diverged from one-shot:\ninc=$inc\nall=$oneShot")
    // and the merged structure is what it should be
    assert(inc(11L) == 1L, "bridge 3-10 must drag {10,11} into component 1")
    assert(inc(27L) == 20L, "new nodes 26,27 must join the path component")
    assert(inc(50L) == 50L && inc(51L) == 50L, "new-only component labels by its min id")
    assert(inc(40L) == 40L && inc(41L) == 40L, "untouched prior component keeps its label")
  }

  test("incrementalComponents: three-batch chained fold equals one-shot") {
    // Chains the fold the way the streaming index would: label table from
    // tick N feeds tick N+1. Edges chosen so every tick merges ACROSS
    // earlier ticks (the case where contraction must be transitive).
    val all = Seq((1L, 2L), (3L, 4L), (5L, 6L), (2L, 3L), (7L, 8L),
      (6L, 7L), (4L, 5L)).toDF("id_a", "id_b")
    val parts = Seq(
      Seq((1L, 2L), (3L, 4L), (5L, 6L)),
      Seq((2L, 3L), (7L, 8L)),
      Seq((6L, 7L), (4L, 5L)))
    val folded = parts.tail.foldLeft(
      Graph.connectedComponents(parts.head.toDF("id_a", "id_b"))) {
      (labels, batch) =>
        Graph.incrementalComponents(labels, batch.toDF("id_a", "id_b"))
    }
    assert(labelMap(folded) === labelMap(Graph.connectedComponents(all)))
    // everything collapsed to one component labeled by the global min
    assert(labelMap(folded).values.toSet === Set(1L))
  }

  test("incrementalComponents: empty delta returns prevLabels unchanged") {
    val b1 = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val prev = Graph.connectedComponents(b1)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(labelMap(Graph.incrementalComponents(prev, empty)) === labelMap(prev))
  }

  // ------------------------------------- Dedup.duplicateSubstringSpans

  /** Naive Lee-et-al oracle: the set of characters covered by ANY substring
    * of length ≥ L (every length, not just L) occurring ≥ 2 times in the
    * corpus — independently recomputed by brute-force occurrence counting,
    * so the spec certifies the window-equivalence reduction itself. */
  private def naiveCoveredChars(corpus: Seq[(Long, String)], L: Int): Map[Long, Set[Long]] = {
    def occurrences(s: String): Int = corpus.map { case (_, t) =>
      Iterator.iterate(t.indexOf(s))(i => t.indexOf(s, i + 1)).takeWhile(_ >= 0).size
    }.sum
    corpus.map { case (id, t) =>
      val covered = (for {
        i <- 0 until t.length
        len <- L to (t.length - i)
        s = t.substring(i, i + len)
        if occurrences(s) >= 2
      } yield (i until i + len)).flatten.map(_.toLong + 1L).toSet // 1-based
      id -> covered
    }.toMap.filter(_._2.nonEmpty)
  }

  private def engineCoveredChars(corpus: Seq[(Long, String)], L: Int): Map[Long, Set[Long]] = {
    val spans = ext.Dedup.duplicateSubstringSpans(
        corpus.toDF("doc_id", "text"), minLen = L)
      .as[(Long, Long, Long)].collect()
    spans.groupBy(_._1).map { case (id, ss) =>
      id -> ss.flatMap { case (_, a, b) => (a to b) }.toSet
    }
  }

  test("duplicateSubstringSpans: covered chars equal the naive all-lengths oracle") {
    val corpus = Seq(
      (1L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG unique tail one"),
      (2L, "prefix two THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
      (3L, "abcabcabcabcabcabc totally-unique-middle xyzxyzxyzxyz"),
      (4L, "entirely fresh content w/ zero corpus overlap 0123456789"))
    val L = 8
    assert(engineCoveredChars(corpus, L) === naiveCoveredChars(corpus, L))
  }

  test("duplicateSubstringSpans: pseudo-random low-alphabet stress equals naive oracle") {
    // 2-letter alphabet forces dense accidental repeats, island merges, and
    // overlapping self-repeats — the adversarial regime for span merging.
    val rnd = new scala.util.Random(1206L)
    val corpus = (1L to 6L).map { id =>
      id -> (1 to 40).map(_ => if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    val L = 5
    assert(engineCoveredChars(corpus, L) === naiveCoveredChars(corpus, L))
  }

  test("duplicateSubstringSpansKeepFirst: first copy untouched, later copy removed; subset of the audit") {
    val corpus = Seq(
      (1L, "this exact document repeats verbatim in the corpus"),
      (2L, "this exact document repeats verbatim in the corpus"),
      (3L, "fresh text then this exact document repeats verbatim in the corpus too"))
    val removal = ext.Dedup.duplicateSubstringSpansKeepFirst(
        corpus.toDF("doc_id", "text"), minLen = 10)
      .as[(Long, Long, Long)].collect()
    // doc 1 holds the corpus-first occurrence of every shared window —
    // nothing removed from it; docs 2 and 3 lose their copies
    assert(!removal.exists(_._1 == 1L), s"first copy must survive: ${removal.toSeq}")
    assert(removal.exists(_._1 == 2L) && removal.exists(_._1 == 3L))
    // removal coverage ⊆ audit coverage, and strictly smaller (doc 1 freed)
    def cover(rows: Array[(Long, Long, Long)]) =
      rows.flatMap { case (d, a, b) => (a to b).map(d -> _) }.toSet
    val audit = ext.Dedup.duplicateSubstringSpans(
        corpus.toDF("doc_id", "text"), minLen = 10)
      .as[(Long, Long, Long)].collect()
    assert(cover(removal).subsetOf(cover(audit)))
    assert(cover(removal).size < cover(audit).size)
    // naive independent recompute of the keep-first window rule
    val L = 10
    val windows = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(i => (id, i + 1L, t.substring(i, i + L))) }
    val naive = windows.groupBy(_._3).values
      .flatMap(_.sortBy(w => (w._1, w._2)).drop(1)) // all but the corpus-first
      .map(w => (w._1, w._2)).toSet
    val engineCovered = cover(removal)
    val naiveCovered = naive.flatMap { case (d, p) => (p until p + L).map(d -> _) }
    assert(engineCovered === naiveCovered)
  }

  test("duplicateSubstringSpans: verbatim doc pair is one whole-doc span each; short docs skip") {
    val corpus = Seq(
      (1L, "this exact document repeats verbatim in the corpus"),
      (2L, "this exact document repeats verbatim in the corpus"),
      (3L, "short")) // < minLen, must not participate
    val spans = ext.Dedup.duplicateSubstringSpans(corpus.toDF("doc_id", "text"), minLen = 10)
      .as[(Long, Long, Long)].collect().toSet
    val n = corpus.head._2.length.toLong
    assert(spans === Set((1L, 1L, n), (2L, 1L, n)))
  }

  // ---------------------------------- MediaCodecs.aHash64/dHash64 + index

  private def texture(id: Long)(x: Int, y: Int): (Int, Int, Int) = (
    ((x * x * (3 + id % 7) + y * y * (5 + id % 11) + x * y * (1 + id % 13) + 37 * id) % 200).toInt,
    ((x * x * (2 + id % 5) + y * y * (7 + id % 3) + x * y * (2 + id % 11) + 11 * id) % 200).toInt,
    ((x * x * (1 + id % 9) + y * y * (4 + id % 13) + x * y * (3 + id % 7) + 23 * id) % 200).toInt)

  test("aHash64/dHash64: exactly invariant to a uniform non-clipping brightness shift") {
    val base = ext.MediaCodecs.bmpBytes(16, 12, texture(5L))
    val brighter = ext.MediaCodecs.bmpBytes(16, 12, (x, y) => {
      val (r, g, b) = texture(5L)(x, y); (r + 4, g + 4, b + 4) // ≤ 203, no clip
    })
    // +4 on every channel shifts every luma by exactly +4: each grid cell
    // and the grid mean move together, so every comparison is unchanged.
    assert(ext.MediaCodecs.aHash64(base) === ext.MediaCodecs.aHash64(brighter))
    assert(ext.MediaCodecs.dHash64(base) === ext.MediaCodecs.dHash64(brighter))
  }

  test("aHash64: local vandalism flips few bits; distinct textures are far apart") {
    val a = ext.MediaCodecs.aHash64(ext.MediaCodecs.bmpBytes(16, 12, texture(5L))).get
    val vandal = ext.MediaCodecs.aHash64(ext.MediaCodecs.bmpBytes(16, 12, (x, y) =>
      if (x < 2 && y < 2) (255, 255, 255) else texture(5L)(x, y))).get
    val other = ext.MediaCodecs.aHash64(ext.MediaCodecs.bmpBytes(16, 12, texture(6L))).get
    assert(java.lang.Long.bitCount(a ^ vandal) <= 7,
      s"vandalized copy too far: ${java.lang.Long.bitCount(a ^ vandal)}")
    assert(java.lang.Long.bitCount(a ^ other) > 7,
      s"distinct texture too close: ${java.lang.Long.bitCount(a ^ other)}")
  }

  test("aHash64/dHash64: None on non-BMP bytes and on images under the grid size") {
    assert(ext.MediaCodecs.aHash64(Array[Byte](1, 2, 3)).isEmpty)
    val tiny = ext.MediaCodecs.bmpBytes(6, 6, (_, _) => (10, 10, 10))
    assert(ext.MediaCodecs.aHash64(tiny).isEmpty)
    val narrow = ext.MediaCodecs.bmpBytes(8, 8, (_, _) => (10, 10, 10))
    assert(ext.MediaCodecs.aHash64(narrow).isDefined) // 8 wide is enough for aHash
    assert(ext.MediaCodecs.dHash64(narrow).isEmpty)   // but not for the 9-wide dHash grid
  }

  test("hammingNearDuplicates: pigeonhole finds exactly the naive all-pairs result") {
    val rnd = new scala.util.Random(1207L)
    val base = (1L to 30L).map(id => (id, rnd.nextLong()))
    // plant close pairs: ids 101..105 are ids 1..5 with d bits flipped
    val planted = (1L to 5L).map { id =>
      val sig = base(id.toInt - 1)._2
      val flipped = (0 until id.toInt).foldLeft(sig)((s, j) => s ^ (1L << (j * 11)))
      (id + 100L, flipped)
    }
    val sigs = (base ++ planted).toDF("id", "sig")
    val d = 7
    val got = ext.Dedup.hammingNearDuplicates(sigs, "id", "sig", d, 64)
      .as[(Long, Long, Long)].collect().toSet
    val all = (base ++ planted)
    val naive = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      hm = java.lang.Long.bitCount(sa ^ sb).toLong if hm <= d
    } yield (ia, ib, hm)).toSet
    assert(got === naive)
    assert((1L to 5L).forall(id => got.exists(p => p._1 == id && p._2 == id + 100L)))
  }

  test("hammingNearDuplicates: rejects an uncovered-remainder block split") {
    val sigs = Seq((1L, 2L)).toDF("id", "sig")
    val e = intercept[IllegalArgumentException] {
      ext.Dedup.hammingNearDuplicates(sigs, "id", "sig", maxDistance = 4, bits = 64)
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  // ---------------------------------------- Dedup.streamingLshMaintain

  test("streamingLshMaintain: index after N ticks equals one-shot rebuild; pairs equal batch probe") {
    withTempDir { root =>
      val base = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six seven"),
        (3L, "lorem ipsum dolor sit amet consectetur"),
        (4L, "completely different text about sparks")).toDF("doc_id", "text")
      // deltas: near-dup copies of docs 1/2 (first word dropped) + one novel doc
      val d1 = Seq((101L, "beta gamma delta epsilon zeta"),
        (102L, "two three four five six seven")).toDF("doc_id", "text")
      val d2 = Seq((201L, "ipsum dolor sit amet consectetur"),
        (202L, "a wholly novel document with fresh words")).toDF("doc_id", "text")
      d1.coalesce(1).write.mode("append").parquet(s"$root/landing")
      d2.coalesce(1).write.mode("append").parquet(s"$root/landing")
      ext.Dedup.lshIndexBuild(base, s"$root/idx", batch = 0)
      val stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/landing")
      ext.Dedup.streamingLshMaintain(stream, s"$root/idx", s"$root/pairs",
        s"$root/ckpt", threshold = 0.5)
      // two ticks landed as index partitions beyond the base
      val batches = spark.read.parquet(s"$root/idx/buckets")
        .select(col("batch")).distinct().as[Int].collect().sorted
      assert(batches.length === 3 && batches.head === 0)
      // INDEX EQUIVALENCE: streamed index rows ≡ one-shot rebuild over the
      // union (bucket and shingle tables, batch column ignored)
      ext.Dedup.lshIndexBuild(base.unionByName(d1).unionByName(d2),
        s"$root/idx_oneshot", batch = 0)
      def buckets(p: String) = spark.read.parquet(p)
        .select(col("doc_id"), col("band"), col("band_key"))
        .as[(Long, Int, Long)].collect().toSet
      assert(buckets(s"$root/idx/buckets") === buckets(s"$root/idx_oneshot/buckets"))
      def shingleCounts(p: String) = spark.read.parquet(p)
        .select(col("doc_id"), size(col("sh")).cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(shingleCounts(s"$root/idx/shingles") === shingleCounts(s"$root/idx_oneshot/shingles"))
      // PAIR EQUIVALENCE: the drained pairs are exactly the full-corpus
      // near-dup pairs that touch a delta
      val streamed = spark.read.parquet(s"$root/pairs")
        .select(col("index_id"), col("delta_id")).as[(Long, Long)].collect().toSet
      val full = ext.Dedup.minhashNearDuplicatesPortable(
          base.unionByName(d1).unionByName(d2), threshold = 0.5)
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
        .filter((p: (Long, Long)) => p._2 >= 100L)
      assert(streamed === full)
      assert(streamed.contains((1L, 101L)) && streamed.contains((2L, 102L))
        && streamed.contains((3L, 201L)), s"planted pairs missing: $streamed")
    }
  }

  // ------------------------------------------ Similarity.nnDescentRound

  test("nnDescentRound: recall vs exact top-k is monotone and strictly improves a coarse LSH seed") {
    // Clustered fixture (6 centers × 10 members, small noise): true top-k
    // are cluster mates, and a 2-table LSH seed splits some clusters so the
    // NoN round has cross-table composition to do. A SINGLE-table seed is
    // bucket-closed (nothing to compose) — which is why both the seed here
    // and q336 use two salted tables.
    val rnd = new scala.util.Random(1208L)
    val centers = Array.fill(12)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
    val emb = (0 until 120).map { i =>
      val c = centers(i % 12)
      (i + 1L, c.toSeq.map(v => v + (rnd.nextFloat() * 0.3f - 0.15f)))
    }.toDF("vec_id", "embedding")
    val k = 3
    val exact = ext.Similarity.knnJoin(emb, emb, k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val g0 = ext.Similarity.lshKnnGraph(emb, k, bits = 7, dim = 8,
      salts = Seq(0L, 1L))
    val g0Set = g0.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val g1 = ext.Similarity.nnDescentRound(g0, emb, k, vecCol = "embedding")
    val g1Set = g1.select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val (h0, h1) = ((g0Set & exact).size, (g1Set & exact).size)
    // monotone: a true hit can only be displaced by a strictly better
    // candidate, which would itself be in the exact top-k
    assert(h1 >= h0, s"refinement lost recall: $h0 -> $h1")
    assert(h1 > h0, s"fixture too easy: seed already at $h0/${exact.size}")
    // structural invariants: no self edges, ≤ k per node
    assert(g1.filter(col("query_id") === col("neighbor_id")).count() === 0L)
    val maxDeg = g1.groupBy(col("query_id")).count().agg(max(col("count")))
      .as[Long].collect().head
    assert(maxDeg <= k)
  }

  // -------------------------------------------- TextAnalysis.bpeDecode

  test("bpeDecode inverts bpeEncodedWords over every word, incl. repeated-pair runs") {
    // "abab"/"aaa" exercise the non-overlapping replace contract; the
    // round trip must hold regardless of how merges tile a run.
    val docs = Seq(
      (1L, "the cat sat on the mat abab aaa"),
      (2L, "the thematic theme then repeats the the the"),
      (3L, "numbers 12345 mix12 with letters abababab")).toDF("doc_id", "text")
    val enc = ext.TextAnalysis.bpeEncodedWords(docs, "doc_id", col("text"), rounds = 5)
    val bad = enc.filter(ext.TextAnalysis.bpeDecode(col("seq")) =!= col("w")).count()
    assert(bad === 0L)
    // and decode really is token-list concatenation, not a no-op: at least
    // one word must have merged into a multi-char symbol
    val merged = enc.filter(col("seq").rlike("·[a-z0-9]{2,}·")).count()
    assert(merged > 0L, "no merge ever applied — trainer fixture too weak")
  }

  // ------------------------------------------- Sampling.mixtureQuotas guard

  test("mixtureQuotas: negative weight and zero weight-sum raise in-plan") {
    val neg = Seq(("a", 5L), ("b", -1L)).toDF("g", "w")
    val e1 = intercept[Exception] {
      ext.Sampling.mixtureQuotas(neg, "g", "w", 10L).collect()
    }
    assert(e1.getMessage.contains("negative weight") ||
      Option(e1.getCause).exists(_.getMessage.contains("negative weight")))
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("g", "w")
    val e2 = intercept[Exception] {
      ext.Sampling.mixtureQuotas(zero, "g", "w", 10L).collect()
    }
    assert(e2.getMessage.contains("weight sum") ||
      Option(e2.getCause).exists(_.getMessage.contains("weight sum")))
    // the happy path is untouched by the guard
    val ok = Seq(("a", 3L), ("b", 1L)).toDF("g", "w")
    val q = ext.Sampling.mixtureQuotas(ok, "g", "w", 10L)
      .select(col("group"), col("quota")).as[(String, Long)].collect().toMap
    assert(q("a") + q("b") == 10L && q("a") > q("b"))
  }
}
