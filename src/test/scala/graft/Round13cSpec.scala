package graft

import org.apache.spark.sql.functions._

import graft.ext.{MediaCodecs, Multimodal, TextAnalysis}

/** Round-13c specs: audio VAD segmentation (q359), video shot-boundary
  * segmentation (q360), URL canonicalization dedup (q361), and HTML → text
  * extraction (q362). */
class Round13cSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------------
  // MediaCodecs.frameEnergies
  // ---------------------------------------------------------------------

  test("frameEnergies: exact Σv² per full frame, trailing partial dropped") {
    // 7 samples, frameWidth 3 → frames [1,2,3], [4,5,6]; sample 7 dropped.
    val wav = MediaCodecs.wavBytes(8000, 1, Array[Short](1, 2, 3, 4, 5, 6, 7))
    val e = MediaCodecs.frameEnergies(wav, frameWidth = 3).get
    assert(e.toSeq == Seq(1L + 4 + 9, 16L + 25 + 36))
  }

  test("frameEnergies: None on non-WAV bytes") {
    assert(MediaCodecs.frameEnergies(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  // ---------------------------------------------------------------------
  // Multimodal.vadSpans
  // ---------------------------------------------------------------------

  test("vadSpans: maximal runs of active frames, inclusive endpoints") {
    // clip 1: active frames {1,2,3, 6, 8,9}; clip 2: all silent.
    val frames = Seq(
      (1L, 0, 5L), (1L, 1, 100L), (1L, 2, 200L), (1L, 3, 300L), (1L, 4, 5L),
      (1L, 5, 5L), (1L, 6, 400L), (1L, 7, 5L), (1L, 8, 500L), (1L, 9, 600L),
      (2L, 0, 5L), (2L, 1, 5L)
    ).toDF("media_id", "frame", "energy")
    val spans = Multimodal.vadSpans(frames, "media_id", "frame", "energy",
        thresholdEnergy = 50L)
      .orderBy("media_id", "span_start")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(spans == Seq(
      (1L, 1L, 3L, 3L, 600L),
      (1L, 6L, 6L, 1L, 400L),
      (1L, 8L, 9L, 2L, 1100L)))
  }

  test("q359 fixture: every clip alternates voiced/silent on the 4-frame grid") {
    // Reproduce clip id=0's frames and check the span boundaries follow the
    // 400-sample (4-frame) blocks: blocks with (blk + id) % 3 != 0 are voiced.
    val id = 0L
    val n = 4000
    val samples = Array.tabulate(n) { i =>
      val voiced = (i / 400 + id) % 3 != 0
      val v =
        if (voiced) ((i.toLong * (7 + id % 11) + 13 * id) % 3001L) - 1500L
        else ((i.toLong * (3 + id % 7) + 11 * id) % 41L) - 20L
      v.toShort
    }
    val e = MediaCodecs.frameEnergies(
      MediaCodecs.wavBytes(8000, 1, samples), 100).get
    assert(e.length == 40)
    e.zipWithIndex.foreach { case (en, f) =>
      val voiced = (f / 4) % 3 != 0
      if (voiced) assert(en > 1000000L, s"frame $f should be loud, got $en")
      else assert(en <= 40000L, s"frame $f should be quiet, got $en")
    }
  }

  // ---------------------------------------------------------------------
  // MediaCodecs.videoFrameHashes + Multimodal.shotSpans
  // ---------------------------------------------------------------------

  test("videoFrameHashes: per-frame aHash64 in frame order") {
    def frame(seed: Int) = MediaCodecs.bmpBytes(16, 12, (x, y) =>
      ((x * 7 + seed) % 256, (y * 11 + seed) % 256, (x * y + seed) % 256))
    val vid = MediaCodecs.videoBytes(Seq(frame(0), frame(0), frame(90)))
    val hs = MediaCodecs.videoFrameHashes(vid).get
    assert(hs.length == 3)
    assert(hs(0) == MediaCodecs.aHash64(frame(0)).get)
    assert(hs(0) == hs(1))
    assert(hs(2) == MediaCodecs.aHash64(frame(90)).get)
  }

  test("videoFrameHashes: None on non-GVID bytes") {
    assert(MediaCodecs.videoFrameHashes("not a video".getBytes("UTF-8")).isEmpty)
  }

  test("shotSpans: boundary iff Hamming > maxDistance; frame 0 opens shot 1") {
    // hashes: 0, 0 (same shot), 0xFF (cut), 0xFF, 0xFE (1 bit — same shot)
    val frames = Seq(
      (1L, 0, 0L), (1L, 1, 0L), (1L, 2, 255L), (1L, 3, 255L), (1L, 4, 254L)
    ).toDF("media_id", "frame", "fhash")
    val shots = Multimodal.shotSpans(frames, "media_id", "frame", "fhash",
        maxDistance = 3)
      .orderBy("shot")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(shots == Seq(
      (1L, 1L, 0L, 1L, 2L),
      (1L, 2L, 2L, 4L, 3L)))
  }

  test("q360 fixture: scene cuts and the flash frame segment as designed") {
    // Clip id=0 (a flash clip): scenes 0-3, 4-7, 8-9 with an all-white flash
    // at frame 5 → expected shots: [0,3], [4,4], [5,5], [6,7], [8,9] —
    // PROVIDED each cut clears the Hamming threshold; assert exactly the
    // spans the real hashes produce, requiring within-scene stability.
    val id = 0L
    val nf = 10
    val frames = (0 until nf).map { f =>
      val sc = (f / 4).toLong
      MediaCodecs.bmpBytes(16, 12, (x, y) =>
        if (id % 4 == 0 && f == 5) (255, 255, 255)
        else (
          ((x * x * (3 + (id + sc) % 7) + y * y * (5 + (id + 2 * sc) % 11)
            + x * y * (1 + (id + sc) % 13) + 37 * id + 101 * sc) % 256).toInt,
          ((x * x * (2 + (id + 2 * sc) % 5) + y * y * (7 + (id + sc) % 3)
            + x * y * (2 + (id + 2 * sc) % 11) + 11 * id + 53 * sc) % 256).toInt,
          ((x * x * (1 + (id + sc) % 9) + y * y * (4 + (id + 2 * sc) % 13)
            + x * y * (3 + (id + sc) % 7) + 23 * id + 29 * sc) % 256).toInt))
    }
    val hs = MediaCodecs.videoFrameHashes(MediaCodecs.videoBytes(frames)).get
    // within-scene frames are bit-identical (excluding the flash)
    assert(hs(0) == hs(1) && hs(1) == hs(2) && hs(2) == hs(3))
    assert(hs(4) == hs(6) && hs(6) == hs(7))
    assert(hs(8) == hs(9))
    // scene cuts and the flash clear Hamming 16 for this clip
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(3), hs(4)) > 16)
    assert(ham(hs(4), hs(5)) > 16)
    assert(ham(hs(5), hs(6)) > 16)
    assert(ham(hs(7), hs(8)) > 16)
  }

  // ---------------------------------------------------------------------
  // TextAnalysis.canonicalUrl
  // ---------------------------------------------------------------------

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(TextAnalysis.canonicalUrl(col("url")))
      .as[String].collect().toSeq

  test("canonicalUrl: case, default port, trailing slash, fragment, tracking") {
    val variants = Seq(
      "http://www.ex1.com/a/2?q=17&page=2",
      "HTTP://www.ex1.com:80/a/2?q=17&page=2",
      "http://WWW.EX1.COM/a/2?page=2&q=17",
      "http://www.ex1.com/a/2/?q=17&page=2",
      "http://www.ex1.com/a/2?q=17&page=2&utm_source=feed&fbclid=1",
      "http://www.ex1.com/a/2?page=2&q=17#sec")
    val cs = canon(variants: _*)
    assert(cs.distinct == Seq("http://www.ex1.com/a/2?page=2&q=17"))
  }

  test("canonicalUrl: non-default port kept, https :443 stripped, empty path → /") {
    assert(canon("https://Ex.com:443") == Seq("https://ex.com/"))
    assert(canon("https://ex.com:8443/x") == Seq("https://ex.com:8443/x"))
    assert(canon("http://ex.com:8080/") == Seq("http://ex.com:8080/"))
  }

  test("canonicalUrl: all params tracking → query dropped entirely") {
    assert(canon("http://ex.com/p?utm_source=a&utm_medium=b&gclid=z&ref=h")
      == Seq("http://ex.com/p"))
  }

  test("canonicalUrl: scheme-less inputs pass through unchanged (no ':///' collision)") {
    // Without the guard, every relative URL extracts empty scheme/host and
    // collapses to ':///…' — 'foo.html' and 'bar.html' would silently merge
    // under one dedup key (round-13 ADVICE item).
    val rel = Seq("foo.html", "bar.html", "a.html?x=1", "b.html?x=1", "/abs/path")
    assert(canon(rel: _*) == rel)
    assert(canon(rel: _*).distinct.size == rel.size)
  }

  test("canonicalUrl: q361 collapses 240 variants to 40 pages, 6 each") {
    val out = SparkEntry.queries("q361_url_canonical_dedup")(spark, "unused")
      .as[(String, Long, Long)].collect().toSeq
    assert(out.length == 40)
    assert(out.forall(_._2 == 6L))
    // keeper is the variant-0 row: id = g (ids 0..39)
    assert(out.map(_._3).sorted == (0L until 40L))
  }

  // ---------------------------------------------------------------------
  // TextAnalysis.htmlToText
  // ---------------------------------------------------------------------

  private def extract(html: String): String =
    Seq(html).toDF("h").select(TextAnalysis.htmlToText(col("h")))
      .as[String].head()

  test("htmlToText: script/style bodies dropped, tags spaced, entities decoded") {
    val html = "<html><head><style>p{x:1}</style>" +
      "<script>var s = \"<p>hidden</p>\"; if (1 < 2 && 2 > 1) {}</script>" +
      "</head><body><h1>Title</h1><p>a</p><p>b</p></body></html>"
    assert(extract(html) == "Title a b")
  }

  test("htmlToText: adjacent block elements do not fuse words") {
    assert(extract("<p>end</p><p>start</p>") == "end start")
  }

  test("htmlToText: &amp; decodes LAST — &amp;lt; yields the literal &lt;") {
    assert(extract("<p>A &amp;amp; B</p>") == "A &amp; B")
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
    assert(extract("<p>&lt;tag&gt; &quot;q&#39;s&quot;</p>")
      == "<tag> \"q's\"")
  }

  test("htmlToText: whitespace runs collapse, result trimmed") {
    assert(extract("  <p>a\n\n b\tc </p>  ") == "a b c")
  }

  // ---------------------------------------------------------------------
  // q363 curation funnel
  // ---------------------------------------------------------------------

  test("q363 funnel: counts are a consistent monotone attrition chain") {
    val rows = SparkEntry.queries("q363_curation_funnel")(
        spark, "/root/testdata/sf0.001")
      .orderBy("stage_idx")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._2) == Seq("all", "lang_en", "min_length", "quality",
      "repetition", "exact_dedup", "near_dedup"))
    // chain: every stage's n_in equals the previous stage's n_kept,
    // n_dropped = n_in - n_kept >= 0, and stage 0 drops nothing
    rows.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur._3 == prev._4, s"n_in of ${cur._2} != n_kept of ${prev._2}")
    }
    rows.foreach { r =>
      assert(r._5 == r._3 - r._4 && r._5 >= 0, s"bad n_dropped in $r")
    }
    assert(rows.head._5 == 0L)
    // the planted exact copies (id+200000, every 5th doc) guarantee the
    // exact-dedup stage fires; the planted near-dups (id+100000, every 3rd
    // doc) guarantee the near-dedup stage fires
    assert(rows(5)._5 > 0L, "exact_dedup dropped nothing")
    assert(rows(6)._5 > 0L, "near_dedup dropped nothing")
  }

  test("canonicalUrl is idempotent: the canonical form is a fixed point") {
    val parts = for {
      scheme <- Seq("http", "HTTPS", "ftp")
      host <- Seq("Ex.com", "ex.com:80", "ex.com:443", "ex.com:8080")
      path <- Seq("", "/", "/a", "/a/b/")
      q <- Seq("", "?b=2&a=1", "?utm_source=x", "?a=1&utm_medium=m&z=9")
      frag <- Seq("", "#top")
    } yield s"$scheme://$host$path$q$frag"
    val df = parts.toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")).as("c1"))
      .select(col("c1"), TextAnalysis.canonicalUrl(col("c1")).as("c2"))
    assert(df.where(col("c1") =!= col("c2")).count() == 0L,
      "canonicalUrl must be idempotent on its own output")
  }

  test("q366: coverage bounded, silent segments 0, voiced mass consistent") {
    val rows = SparkEntry.queries("q366_transcript_vad_coverage")(
        spark, "unused")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.length == 48 * 4)
    rows.foreach { case (_, _, s0, e0, vf, cp) =>
      val len = e0 - s0 + 1
      assert(vf >= 0L && vf <= len)
      assert(cp == 1000L * vf / len)
    }
    // the fixture alternates voiced/silent 4-frame blocks, so every clip
    // has BOTH partially-covered and fully-covered segments overall
    assert(rows.exists(_._5 == 0L) || rows.exists(r => r._6 < 1000L))
    assert(rows.exists(r => r._6 > 0L))
  }

  // ---------------------------------------------------------------------
  // Graph.louvainMoveRound (q367)
  // ---------------------------------------------------------------------

  test("louvainMoveRound: path graph 1-2-3 hand computation") {
    // degrees k1=1 k2=2 k3=1, 2m=4; gains: 1→2 and 3→2 (4−2=2>0), node 2
    // ties between 1 and 3 (both 4−2) → smaller id 1. Synchronized moves
    // give communities {2:{1,3}} and {1:{2}}, no internal edges, each with
    // q_contrib = 2·4·0 − 2² = −4.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.ext.Graph.louvainMoveRound(edges)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 2L, 0L, -4L),
      (2L, 2L, 2L, 0L, -4L)))
  }

  test("louvainMoveRound: star K1,3 — leaves adopt the center, center swaps to leaf 1") {
    // k0=3, leaves k=1, 2m=6: every leaf's best gain is 6−3=3>0 toward 0;
    // the center ties across leaves (6−3) → leaf 1. Communities {0:{1,2,3}}
    // (tot 3, no internal edges since 0 itself left) and {1:{0}} (tot 3).
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val out = graft.ext.Graph.louvainMoveRound(edges)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 3L, 0L, -9L),
      (1L, 1L, 3L, 0L, -9L)))
  }

  test("q367: partition invariants on the supplier-part graph") {
    val out = SparkEntry.queries("q367_louvain_move")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val nNodes = out.map(_._2).sum
    val totDeg = out.map(_._3).sum
    val internal = out.map(_._4).sum
    assert(totDeg % 2 == 0 && internal <= totDeg / 2,
      "internal edges cannot exceed m")
    assert(nNodes > 0 && out.forall(_._2 >= 1))
    // q_contrib consistency: 2·(2m)·e_c − tot_c²
    out.foreach { case (_, _, tot, e, q) =>
      assert(q == 2L * totDeg * e - tot * tot)
    }
  }

  // ---------------------------------------------------------------------
  // Graph.kTruss (q368)
  // ---------------------------------------------------------------------

  test("kTruss: triangle with a pendant — the pendant edge peels, the triangle stays") {
    // edges: triangle 1-2-3 plus pendant 3-4. Pendant support 0 → peeled in
    // round 1; triangle edges each have support 1 and survive k=3 forever.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.ext.Graph.kTruss(edges, k = 3L, maxRounds = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("kTruss: cascade — peeling one edge collapses the dependent triangle") {
    // Two triangles sharing edge (2,3): {1,2,3} and {2,3,4}, plus edge (4,5).
    // k=4 (support >= 2): only (2,3) has support 2; all other triangle edges
    // have support 1 → round 1 keeps just (2,3); round 2 peels it too
    // (support 0 now) → empty 4-truss. The bounded loop must run the
    // CASCADE, not stop after one peel.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = graft.ext.Graph.kTruss(edges, k = 4L, maxRounds = 4)
    assert(out.count() == 0L)
  }

  test("q368: every surviving edge's support is >= k-2 and consistent") {
    val out = SparkEntry.queries("q368_ktruss")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.forall(_._3 >= 1L))
    // support consistency: recompute common neighbors within the truss's
    // own edge set union the peeled survivors' justifying round is the
    // last executed one — here just check closure: both endpoints appear
    val nodes = out.flatMap(r => Seq(r._1, r._2)).toSet
    assert(out.forall(r => nodes(r._1) && nodes(r._2)))
  }

  test("louvainSweeps: path 1-2-3 two synchronized sweeps hand computation") {
    // Sweep 1 (singletons): 1→2, 2→1 (tie to smaller id), 3→2.
    // Sweep 2 from {1:2, 2:1, 3:2}: node1 gains 4·1−1·(2−2+1)=3 toward
    // comm 1; node2 gains 4·2−2·(2−2+2)=4 toward comm 2; node3 gains 3
    // toward comm 1 — the known synchronized ping-pong. Final partition
    // {1:{1,3}, 2:{2}}, no internal edges, q_contrib −4 each.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = graft.ext.Graph.louvainSweeps(edges, sweeps = 2)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 0L, -4L),
      (2L, 1L, 2L, 0L, -4L)))
  }

  test("louvainSweeps: sweep 1 equals louvainMoveRound's partition summary") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val a = graft.ext.Graph.louvainSweeps(edges, sweeps = 1)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b = graft.ext.Graph.louvainMoveRound(edges)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b, "singleton-init sweep must reduce to the move round")
  }

  test("vadSpans ≡ reference implementation on 30 pseudo-random clips") {
    // LCG-generated energy tables; spans checked against a plain-Scala
    // gaps-and-islands reference, clip by clip.
    var seed = 12345L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val frames = (0 until 30).flatMap { clip =>
      val nf = 5 + (next() % 36).toInt
      (0 until nf).map(f => (clip.toLong, f, next() % 1000L))
    }
    val thr = 500L
    val got = Multimodal.vadSpans(frames.toDF("media_id", "frame", "energy"),
        "media_id", "frame", "energy", thr)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = frames.groupBy(_._1).flatMap { case (clip, rows) =>
      val active = rows.sortBy(_._2).filter(_._3 > thr)
      val runs = active.foldLeft(List.empty[List[(Long, Int, Long)]]) {
        case (acc, r) => acc match {
          case (h @ ((_, pf, _) :: _)) :: t if r._2 == pf + 1 => (r :: h) :: t
          case _ => List(r) :: acc
        }
      }
      runs.map { run =>
        (clip, run.last._2.toLong, run.head._2.toLong, run.size.toLong,
          run.map(_._3).sum)
      }
    }.toSet
    assert(got == expected)
  }

  // ---------------------------------------------------------------------
  // TextAnalysis.sentences + q370 chunking
  // ---------------------------------------------------------------------

  test("sentences: terminal runs split, trailing punct stripped, empties dropped") {
    val got = Seq("One two. Three four! Five?? Six.")
      .toDF("t").select(TextAnalysis.sentences(col("t")))
      .as[Seq[String]].head()
    assert(got == Seq("One two", "Three four", "Five", "Six"))
    val empty = Seq("").toDF("t").select(TextAnalysis.sentences(col("t")))
      .as[Seq[String]].head()
    assert(empty.isEmpty)
    val noPunct = Seq("no punct here").toDF("t")
      .select(TextAnalysis.sentences(col("t"))).as[Seq[String]].head()
    assert(noPunct == Seq("no punct here"))
  }

  test("q370: chunks partition each doc's sentences in order, budget respected") {
    val rows = SparkEntry.queries("q370_sentence_chunking")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids 0..n-1, sentence spans contiguous across chunks
      assert(sorted.map(_._2) == (0L until sorted.size))
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._5 == a._6 + 1)
        case _ =>
      }
      // prefix-sum contract: every chunk except the last starts under the
      // budget boundary and only the straddling sentence may overflow
      sorted.init.foreach(c => assert(c._4 >= 1L))
    }
    // budget 24, max sentence 8 tokens: no chunk exceeds 24 + 8 - 1
    assert(rows.forall(_._4 <= 31L))
  }

  test("q371 streaming funnel: summed ticks equal the batch funnel") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q371_streaming_funnel")(spark, dir)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    // batch recomputation over the same two-tick union corpus
    val T = TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs
      .unionByName(docs.where(col("doc_id") % 10 === 0).select(
        (col("doc_id") + 300000L).as("doc_id"), col("text")))
      .unionByName(docs.where(col("doc_id") % 10 === 5).select(
        (col("doc_id") + 400000L).as("doc_id"), col("text")))
    val stop = Seq("the", "a", "of", "and", "is")
    val flags = corpus
      .withColumn("pass1", T.langId(col("text")) === "en")
      .withColumn("pass2", col("pass1") && T.tokenCount(col("text")) >= 20L)
      .withColumn("pass3",
        col("pass2") && T.qualityScore(col("text"), stop) >= 0.5)
      .withColumn("fp", md5(lower(trim(col("text")))))
    val keep = flags.where(col("pass3")).groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id")).withColumn("__k", lit(true))
    val f4 = flags.join(keep.select(col("doc_id"), col("__k")),
        Seq("doc_id"), "left")
      .withColumn("pass4", col("pass3") && coalesce(col("__k"), lit(false)))
    val exp = f4.agg(count(lit(1)), sum(col("pass1").cast("long")),
        sum(col("pass2").cast("long")), sum(col("pass3").cast("long")),
        sum(col("pass4").cast("long")))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got.map(_._3) ==
      Seq(exp._1, exp._2, exp._3, exp._4, exp._5))
    // both dedup paths must have fired: plants guarantee drops
    assert(exp._4 > exp._5, "exact-dedup stage dropped nothing")
  }

  test("matryoshkaRecall: prefix-identical corpus gives full recall; zero prefix does not") {
    // Deterministic fixture whose constant suffix keeps the prefix and
    // full rankings aligned for every query's top-3 (verified, then
    // pinned): truncation to 2 dims loses nothing here, so every sampled
    // query must report n_hit = k and recall 1000.
    val rows = (0 until 12).map { i =>
      (i.toLong, scala.Seq(i.toFloat + 1f, 2f * i + 1f, 5f, 5f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.ext.Similarity
      .matryoshkaRecall(df, prefixDim = 2, k = 3, queryMod = 6)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 == 3L && r._3 == 1000L),
      s"suffix-constant corpus must preserve the ranking: $out")
  }

  test("q372: recall bounded and keyed by the sampled queries") {
    val out = SparkEntry.queries("q372_matryoshka_recall")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.forall(r => r._1 % 10 == 0))
    assert(out.forall(r => r._2 >= 0L && r._2 <= 10L))
    assert(out.forall(r => r._3 == 100L * r._2))
  }

  test("labelMrr: hand-built fixture ranks and reciprocal ranks") {
    // query 0 (label 1): nearest is id 1 (label 2), then id 2 (label 1)
    // → first_rel_rank 2, rr 500000, hit@1 = 0, hit@2 would be 1.
    val rows = Seq(
      (0L, Seq(1f, 0f), 1),
      (1L, Seq(0.99f, 0.1f), 2),
      (2L, Seq(0.9f, 0.3f), 1),
      (3L, Seq(-1f, 0f), 3))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = graft.ext.Similarity.labelMrr(df, k = 1, queryMod = 4)
      .as[(Long, Option[Long], Long, Long)].collect().toSeq
    assert(out == Seq((0L, Some(2L), 500000L, 0L)))
  }

  test("labelMrr: query with no same-label neighbor reports NULL rank, rr 0") {
    val rows = Seq(
      (0L, Seq(1f, 0f), 7),
      (1L, Seq(0.5f, 0.5f), 2),
      (2L, Seq(0.9f, 0.3f), 2))
    val out = graft.ext.Similarity
      .labelMrr(rows.toDF("vec_id", "embedding", "label"), k = 10, queryMod = 3)
      .as[(Long, Option[Long], Long, Long)].collect().toSeq
    assert(out == Seq((0L, None, 0L, 0L)))
  }

  test("hubnessHistogram: counts partition the corpus; mass equals k·|queries|") {
    val out = SparkEntry.queries("q374_hubness")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSeq
    val n = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").count()
    val nQ = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where(col("vec_id") % 10 === 0).count()
    // histogram rows partition all vectors; total retrieved mass = 10·|Q|
    assert(out.map(_._2).sum == n)
    assert(out.map(r => r._1 * r._2).sum == 10L * nQ)
  }

  // ---------------------------------------------------------------------
  // Graph.randomWalks (q376)
  // ---------------------------------------------------------------------

  test("randomWalks: every step follows an edge; walks have full length") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val eSet = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val out = graft.ext.Graph.randomWalks(edges, steps = 3, startMod = 1L)
      .as[(Long, Long, Long)].collect().toSeq
    val byWalk = out.groupBy(_._1)
    assert(byWalk.size == 5 && byWalk.values.forall(_.size == 4))
    byWalk.foreach { case (w, rows) =>
      val path = rows.sortBy(_._2).map(_._3)
      assert(path.head == w, "step 0 is the start node")
      path.sliding(2).foreach { case scala.Seq(u, v) =>
        assert(eSet((u, v)), s"walk $w stepped off-graph: $u -> $v")
      }
    }
  }

  test("randomWalks: deterministic — two runs produce identical tables") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("id_a", "id_b")
    def run() = graft.ext.Graph.randomWalks(edges, steps = 4, startMod = 1L)
      .orderBy("walk_id", "step")
      .as[(Long, Long, Long)].collect().toSeq
    assert(run() == run())
  }

  test("shotSpans ≡ reference implementation on 30 pseudo-random clips") {
    var seed = 777L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val frames = (0 until 30).flatMap { clip =>
      val nf = 3 + (next() % 20).toInt
      (0 until nf).map(f => (clip.toLong, f, next() % 256L))
    }
    val maxD = 3
    val got = Multimodal.shotSpans(frames.toDF("media_id", "frame", "fhash"),
        "media_id", "frame", "fhash", maxD)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = frames.groupBy(_._1).flatMap { case (clip, rows) =>
      val ordered = rows.sortBy(_._2)
      var shot = 0L
      var prev: Option[Long] = None
      val tagged = ordered.map { case (_, f, h) =>
        val cut = prev.forall(p => java.lang.Long.bitCount(p ^ h) > maxD)
        if (cut) shot += 1
        prev = Some(h)
        (shot, f)
      }
      tagged.groupBy(_._1).map { case (sh, fs) =>
        (clip, sh, fs.map(_._2).min.toLong, fs.map(_._2).max.toLong,
          fs.size.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("kTruss ≡ reference peeling on 20 pseudo-random graphs") {
    var seed = 4242L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    (0 until 20).foreach { g =>
      val n = 5 + (next() % 8).toInt
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if next() % 100 < 45
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val k = 3 + (next() % 2).toInt
        // maxRounds = |E| is a true upper bound on peel rounds (every
        // non-final round removes at least one edge), so the engine always
        // reaches the same fixed point the reference peels to — a constant
        // bound could fall short on a worst-case cascade for some seed.
        val got = graft.ext.Graph
          .kTruss(edges.toDF("id_a", "id_b"), k = k.toLong,
            maxRounds = edges.size)
          .as[(Long, Long, Long)].collect().toSet
        // reference: peel to fixed point, then report final support
        var cur = edges.toSet
        var changed = true
        var sup = Map.empty[(Long, Long), Long]
        while (changed) {
          def support(es: Set[(Long, Long)]): Map[(Long, Long), Long] = {
            val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
              .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSet }
            es.map { case (a, b) =>
              (a, b) -> (adj(a) & adj(b)).size.toLong
            }.toMap
          }
          sup = support(cur)
          val nxt = cur.filter(e => sup(e) >= k - 2)
          changed = nxt != cur
          cur = nxt
        }
        val expected = cur.map(e => (e._1, e._2, sup(e)))
        assert(got == expected, s"graph $g (n=$n, k=$k): $got vs $expected")
      }
    }
  }

  test("louvainMoveRound ≡ reference gains on 20 pseudo-random graphs") {
    var seed = 99L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    (0 until 20).foreach { g =>
      val n = 4 + (next() % 7).toInt
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if next() % 100 < 50
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = graft.ext.Graph.louvainMoveRound(edges.toDF("id_a", "id_b"))
          .as[(Long, Long, Long, Long, Long)].collect().toSet
        // reference: singleton-init synchronized move, same tie-breaks
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).sorted }
        val deg = adj.map { case (u, vs) => u -> vs.size.toLong }
        val m2 = deg.values.sum
        val label = adj.keys.map { u =>
          val cands = adj(u).map(v => (deg(u) * deg(v) - m2, v)).sorted
          val (neg, v) = cands.head
          u -> (if (neg < 0) v else u)
        }.toMap
        val comms = label.groupBy(_._2).map { case (c, ms) => c -> ms.keys.toSet }
        val expected = comms.map { case (c, members) =>
          val tot = members.toSeq.map(deg).sum
          val internal = edges.count { case (a, b) =>
            members(a) && members(b)
          }.toLong
          (c, members.size.toLong, tot, internal,
            2L * m2 * internal - tot * tot)
        }.toSet
        assert(got == expected, s"graph $g (n=$n): $got vs $expected")
      }
    }
  }

  test("prefix-sum chunk assignment ≡ reference on 200 pseudo-random docs") {
    // the q370 bucket rule in isolation: chunk = floor(tokens_before / B)
    var seed = 31337L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    val B = 24L
    val sents = (0 until 200).flatMap { doc =>
      val ns = 1 + (next() % 12).toInt
      (0 until ns).map(i => (doc.toLong, i, 1L + next() % 9L))
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("sent_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = sents.toDF("doc_id", "sent_idx", "n_tok")
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("chunk", expr(s"cum_before div $B"))
      .select(col("doc_id"), col("sent_idx"), col("chunk"))
      .as[(Long, Int, Long)].collect().toSet
    val expected = sents.groupBy(_._1).flatMap { case (doc, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (_, i, t) =>
        val c = cum / B; cum += t; (doc, i, c)
      }
    }.toSet
    assert(got == expected)
  }
}
