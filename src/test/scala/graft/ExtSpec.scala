package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Shingles, Similarity, TextAnalysis}
import graft.functions.VectorFunctions

/** Extension-surface operators: text analysis, dedup (exact / MinHash / SimHash /
  * Jaccard), similarity search, custom vector expression. */
class ExtSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("tokenCount / bpeishTokenCount / punctRatio on known strings") {
    import spark.implicits._
    val out = docs((1L, "the quick, brown fox!"))
      .select(
        TextAnalysis.tokenCount(col("text")),
        TextAnalysis.bpeishTokenCount(col("text")),
        round(TextAnalysis.punctRatio(col("text")), 4))
      .as[(Long, Long, Double)].collect().head
    assert(out._1 == 4L)        // whitespace tokens
    assert(out._2 == 6L)        // the|quick|,|brown|fox|!
    assert(out._3 == 0.0952)    // 2 punct / 21 chars
  }

  test("stopwordRatio and qualityScore bounds") {
    import spark.implicits._
    val stop = Seq("the", "a")
    val out = docs((1L, "the cat saw a dog"), (2L, ""))
      .select(col("doc_id"), round(TextAnalysis.stopwordRatio(col("text"), stop), 4),
        TextAnalysis.qualityScore(col("text"), stop))
      .as[(Long, Double, Double)].orderBy("doc_id").collect()
    assert(out(0)._2 == 0.4)
    assert(out(0)._3 > 0 && out(0)._3 <= 1.0)
    assert(out(1)._2 == 0.0)
  }

  test("langId picks the language with most marker hits; und when none") {
    import spark.implicits._
    val out = docs(
      (1L, "the cat is on the mat"),
      (2L, "el gato es de la casa que"),
      (3L, "zzz qqq www"))
      .select(col("doc_id"), TextAnalysis.langId(col("text")))
      .as[(Long, String)].orderBy("doc_id").collect()
    assert(out.map(_._2).toSeq == Seq("en", "es", "und"))
  }

  test("wordShingles builds k-grams; short docs fall back to whole text") {
    import spark.implicits._
    val out = docs((1L, "a b c d"), (2L, "only two"))
      .select(col("doc_id"), Shingles.wordShingles(col("text"), 3))
      .as[(Long, Seq[String])].orderBy("doc_id").collect()
    assert(out(0)._2 == Seq("a b c", "b c d"))
    assert(out(1)._2 == Seq("only two"))
  }

  test("exactDuplicateGroups keeps min id per normalized text") {
    val out = Dedup.exactDuplicateGroups(docs(
      (5L, "Hello World"), (2L, "  hello world "), (9L, "different")))
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 2L && out(0).getAs[Long]("n_copies") == 2L)
    assert(out(1).getAs[Long]("doc_id") == 9L && out(1).getAs[Long]("n_copies") == 1L)
  }

  test("jaccard and pairJaccard compute exact set overlap") {
    import spark.implicits._
    val d = docs((1L, "a b c d"), (2L, "b c d e"))
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val j = Dedup.pairJaccard(pairs, d, k = 1).collect().head.getAs[Double]("jaccard")
    // token sets {a,b,c,d} vs {b,c,d,e}: 3 / 5
    assert(j == 0.6)
  }

  test("minhashNearDuplicates finds a planted near-duplicate and skips unrelated docs") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val d = docs(
      (1L, base),
      (2L, base + " w21"), // near-dup of 1
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 x17 x18 x19 x20"))
    val pairs = Dedup.minhashNearDuplicates(d, threshold = 0.5).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.8)
  }

  test("removeNearDuplicates keeps the lowest-id survivor of each near-dup group") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val d = docs(
      (1L, base), (2L, base + " w21"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 x11 x12 x13 x14 x15 x16 x17 x18 x19 x20"))
    val kept = Dedup.removeNearDuplicates(d, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("simhash signatures: identical docs equal, near docs close, far docs far") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val d = docs((1L, base), (2L, base), (3L, base + " extra"),
      (4L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16"))
    val sigs = Dedup.simhashSignatures(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(1L) == sigs(2L))
    val near = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val far = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(near < far, s"near=$near should be < far=$far")
    assert(far > 16)
  }

  test("simhashNearDuplicates finds Hamming-close pairs via block match") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val d = docs((1L, base), (2L, base),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16"))
    val pairs = Dedup.simhashNearDuplicates(d, maxDistance = 3).collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Long]("hamming"))).toSeq == Seq((1L, 2L, 0L)))
  }

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  test("DotProduct expression: exact value, null propagation, HOF equivalence") {
    import spark.implicits._
    val df = vecs((1L, Seq(1.0, 2.0, 3.0)))
    val dot = df.select(VectorFunctions.dotProduct(col("embedding"), col("embedding")))
      .as[Double].collect().head
    assert(dot == 14.0)
    val hof = df.select(
      aggregate(zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect().head
    assert(dot == hof)
    val nul = df.select(VectorFunctions.dotProduct(lit(null).cast("array<double>"), col("embedding")))
      .collect().head
    assert(nul.isNullAt(0))
  }

  test("TopKAggregator keeps the k largest (value, tag) pairs across partition merges") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i % 2 == 0) "even" else "odd", i.toDouble, i.toLong))
      .toDF("g", "v", "id")
      .repartition(7) // force partial buffers + merges
    val topk = graft.functions.TopKAggregator.topK(3)
    val out = df.groupBy("g").agg(topk(col("v"), col("id")).as("tk"))
      .select(col("g"), col("tk")).as[(String, Seq[(Double, Long)])]
      .collect().toMap
    assert(out("even") == Seq((100.0, 100L), (98.0, 98L), (96.0, 96L)))
    assert(out("odd") == Seq((99.0, 99L), (97.0, 97L), (95.0, 95L)))
  }

  test("StepLookup returns latest series value ≤ key, null before the series") {
    import spark.implicits._
    val series = Seq((10L, 1.0), (20L, 2.0), (30L, 3.0))
    val out = Seq(5L, 10L, 15L, 30L, 99L).toDF("k")
      .select(col("k"), graft.functions.StepLookup.asOfLookup(col("k"), series).as("v"))
      .orderBy("k").collect()
    assert(out.map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSeq ==
      Seq(None, Some(1.0), Some(1.0), Some(3.0), Some(3.0)))
  }

  test("Typed: Dataset view + typed Aggregator matches the untyped aggregation") {
    import graft.engine.{Generators, Silver, Typed}
    val silver = Silver.cleanSales(Generators.salesBatch(spark, 100, seed = 5), lit("t"))
    val typedRev = Typed.revenueByCategory(silver).collect().toMap
    val untyped = silver.filter(col("is_valid"))
      .groupBy("category").agg(sum("total_amount")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(untyped.keySet.subsetOf(typedRev.keySet))
    untyped.foreach { case (k, v) => assert(math.abs(typedRev(k) - v) < 1e-9) }
  }

  test("cosineTopK returns k nearest with deterministic tie-break") {
    val d = vecs(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.01)), (2L, Seq(0.0, 1.0)), (3L, Seq(-1.0, 0.0)))
    val out = Similarity.cosineTopK(d, queryId = 0, k = 2).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L))
    assert(out.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("IVF: training separates clusters; probe-limited search finds the planted neighbor") {
    import graft.ext.IVF
    // two well-separated clusters around (10,0,..) and (-10,0,..), 8 vectors each
    val rows = (0 until 8).map(i => (i.toLong, Seq(10.0 + i * 0.01, 1.0, 0.5, 0.1))) ++
      (8 until 16).map(i => (i.toLong, Seq(-10.0 - i * 0.01, 1.0, 0.5, 0.1)))
    val d = vecs(rows: _*)
    val centroids = IVF.train(d, nCells = 2, iters = 3)
    val cells = IVF.assign(d, centroids).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    // each cluster lands in one cell
    assert((0L until 8L).map(cells).toSet.size == 1)
    assert((8L until 16L).map(cells).toSet.size == 1)
    assert(cells(0L) != cells(8L))
    // nProbe=1 search for vec 0 returns only same-cluster vectors, nearest first
    val hits = IVF.search(d, centroids, queryId = 0, k = 3, nProbe = 1).collect()
    assert(hits.map(_.getAs[Long]("vec_id")).forall(_ < 8))
    assert(hits.head.getAs[Double]("cos_sim") > 0.999)
  }

  test("neardupPairs and lshNeardupPairs find the planted near-identical pair") {
    val d = vecs(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(1.0, 2.0, 3.0, 4.001)),
      (3L, Seq(-4.0, 3.0, -2.0, 1.0)))
    val brute = Similarity.neardupPairs(d, threshold = 0.99).collect()
    assert(brute.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == Set((1L, 2L)))
    val lsh = Similarity.lshNeardupPairs(d, threshold = 0.99, bits = 8, dim = 4).collect()
    assert(lsh.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet == Set((1L, 2L)))
  }

  test("stratifiedSample is a pure row function: identical under repartitioning") {
    import spark.implicits._
    val langs = Seq("en", "de", "zh")
    val docs = (0L until 900L).map(i => (i, langs((i % 3).toInt))).toDF("doc_id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      graft.ext.Sampling.stratifiedSample(df, col("doc_id"), col("lang"),
        graft.ext.Sampling.LangRatesPerMille, graft.ext.Sampling.DefaultRatePerMille)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(7))
    assert(a == b, "sample must not depend on partitioning")
    assert(a.nonEmpty && a.size < 900)
    // per-stratum rates land near their per-mille targets (en 500 vs zh 200)
    val en = a.count(_ % 3 == 0); val zh = a.count(_ % 3 == 2)
    assert(en > zh, s"en (500 per mille, got $en) must out-sample zh (200, got $zh)")
  }

  test("capPerGroup keeps exactly min(cap, group size) rows, partition-invariantly") {
    import spark.implicits._
    // domain sizes 5 / 40 / 400: below, at-ish, and far above the cap of 20
    val docs = ((0L until 5L).map((_, "tiny")) ++ (100L until 140L).map((_, "mid")) ++
      (1000L until 1400L).map((_, "big"))).toDF("doc_id", "source")
    def kept(df: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
      graft.ext.Sampling.capPerGroup(df, col("source"), col("doc_id"), cap = 20)
        .collect().map(r => r.getString(1) -> r.getLong(0)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
    val a = kept(docs)
    assert(a("tiny").size == 5 && a("mid").size == 20 && a("big").size == 20)
    assert(kept(docs.repartition(11)) == a, "kept set must not depend on partitioning")
  }

  test("tfidfTopTerms ranks a document's distinctive term first") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the dog sat on the log"),
      (2L, "zebra zebra zebra the")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, k = 1)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(2L) == "zebra")
    // "the" appears in every doc => idf ln(4/4)=0, never a top term
    assert(!top.values.exists(_ == "the"))
  }

  test("LSH survives a hot bucket: 10k docs, 10% identical, AQE skew-join on") {
    import spark.implicits._
    // 1,000 identical docs collapse to ONE bucket per band => the candidate
    // self-join emits ~500k pairs from a single join key — the worst-case
    // skewed-bucket shape the Dedup scaladoc documents. AQE's skew-join must
    // carry it; correctness: exactly C(1000,2) verified pairs at jaccard 1.0,
    // none among the 9,000 distinct docs, and keep-lowest-id leaves 999 losers.
    val rnd = new scala.util.Random(7)
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((0 until 1000).map(i => (i.toLong, hot)) ++
      (1000 until 10000).map { i =>
        (i.toLong, Seq.fill(8)("tok" + rnd.nextInt(1000000) + "x" + i).mkString(" "))
      }).toDF("doc_id", "text")
    val prevSkew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    try {
      val pairs = Dedup.minhashNearDuplicates(docs, threshold = 0.8,
        numHashes = 16, bands = 4, cacheShingles = false)
      assert(pairs.count() == 1000L * 999L / 2)
      val survivors = Dedup.removeNearDuplicates(docs, threshold = 0.8,
        numHashes = 16, bands = 4)
      assert(survivors.count() == 10000 - 999)
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prevSkew)
      spark.catalog.clearCache() // removeNearDuplicates caches 10k-doc shingles
    }
  }

  test("from_json typed parse agrees with get_json_object incl. malformed docs") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val rows = Seq("""{"k": 7}""", """{"k": 0}""", "{broken", """{"other": 1}""", null)
      .toDF("props")
    val schema = StructType(Seq(StructField("k", LongType)))
    val out = rows.select(
      from_json(col("props"), schema).getField("k").as("typed"),
      get_json_object(col("props"), "$.k").cast("long").as("scalar"))
    assert(out.filter(not(col("typed") <=> col("scalar"))).isEmpty,
      out.collect().mkString(";"))
  }

  test("connectedComponents finds transitive groups, incl. a long path graph") {
    import spark.implicits._
    // Two components via transitivity (1-2-3 with no 1-3 edge, 10-11), plus a
    // 6-node path (diameter 5 → needs several propagation rounds).
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L))
      .toDF("id_a", "id_b")
    val cc = graft.ext.Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(cc(1L) == 1L && cc(2L) == 1L && cc(3L) == 1L)
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert((20L to 25L).forall(cc(_) == 20L), s"path graph mislabeled: $cc")
    assert(cc.size == 11)
  }

  test("connectedComponents handles an empty edge set (observe sum is null)") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.ext.Graph.connectedComponents(edges).count() == 0L)
  }

  test("redactPii replaces every email/phone occurrence and nothing else") {
    import spark.implicits._
    val rows = Seq(
      "mail a@b.co and c.d+e@f-g.org now",     // two emails, one line
      "call 555-123-4567 or 555-765-4321",     // two phones
      "mixed x@y.io then 111-222-3333 end",
      "clean text with no pii at all",
      "not-a-phone 12-345-6789 not-an-email a@b")
      .toDF("text")
    val out = rows.select(TextAnalysis.redactPii(col("text")).as("r")).as[String].collect()
    assert(out(0) == "mail [EMAIL] and [EMAIL] now")
    assert(out(1) == "call [PHONE] or [PHONE]")
    assert(out(2) == "mixed [EMAIL] then [PHONE] end")
    assert(out(3) == "clean text with no pii at all")
    assert(out(4) == "not-a-phone 12-345-6789 not-an-email a@b")
  }

  test("contaminationReport flags a planted leak and ignores disjoint docs") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "XX beta gamma delta epsilon zeta eta theta"), // near-copy → ≥5 shared shingles
      (11L, "totally different words in this one here now")).toDF("doc_id", "text")
    val out = Dedup.contaminationReport(train, bench, minOverlap = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((10L, 1L, 5L)))
  }

  test("WordShingleSet matches the HOF wordShingles form exactly (order included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // Adversarial: empty, pure-whitespace, tabs/newlines (trim only strips
    // 0x20), repeated shingles (distinct order), unicode, fewer-than-k tokens,
    // leading/trailing whitespace, plus random corpora.
    val rows = Seq(
      "", " ", "\t", "a", "a b", "a b c", "a b c d",
      "  padded   with   spaces  ", "\ta leads tab", "trail\t",
      "x y z x y z x y z", "héllo wörld ünïcode shingle test",
      "a\nb\nc\nd", "a  b   c    d") ++
      Seq.fill(500)(Seq.fill(rnd.nextInt(40))("w" + rnd.nextInt(8)).mkString(" "))
    val df = rows.toDF("text")
    val mismatches = df.filter(
      Shingles.wordShingles(col("text"), 3) =!= Shingles.wordShinglesSql(col("text"), 3))
    assert(mismatches.isEmpty, mismatches.collect().take(3).mkString(";"))
    // k=1 exercises the all-tokens path, k=50 the short-document fallback
    assert(df.filter(Shingles.wordShingles(col("text"), 1) =!=
      Shingles.wordShinglesSql(col("text"), 1)).isEmpty)
    assert(df.filter(Shingles.wordShingles(col("text"), 50) =!=
      Shingles.wordShinglesSql(col("text"), 50)).isEmpty)
  }

  test("Md5Hex is value-identical to Spark's md5() function") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = Seq("", "a", "héllo wörld", "x" * 5000) ++
      Seq.fill(1000)(rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString)
    val df = rows.toDF("s")
    val diff = df.filter(
      graft.functions.HashFunctions.md5Hex(col("s")) =!= md5(col("s")))
    assert(diff.isEmpty, diff.collect().take(3).mkString(";"))
  }

  test("Md5Prefix60 is bit-identical to the conv(substring(md5)) SQL form") {
    import graft.ext.PortableHash
    import spark.implicits._
    // Adversarial inputs: empty, unicode, long, and leading-zero-nibble digests
    // (1000 random strings make a high-nibble-zero digest ~certain), in both
    // codegen and interpreted paths.
    val rnd = new scala.util.Random(11)
    val rows = Seq("", "a", "héllo wörld", "x" * 5000) ++
      Seq.fill(1000)(rnd.alphanumeric.take(rnd.nextInt(30) + 1).mkString)
    val df = rows.toDF("s")
    assert(df.filter(PortableHash.hash60(col("s")) =!= PortableHash.hash60Sql(col("s"))).isEmpty)
    val interpreted = df.select(PortableHash.hash60(col("s")).as("h")) // eval path via collect on literal-free plan
      .collect().map(_.getLong(0))
    val sqlForm = df.select(PortableHash.hash60Sql(col("s")).as("h")).collect().map(_.getLong(0))
    assert(interpreted.toSeq == sqlForm.toSeq)
    assert(interpreted.forall(h => h >= 0 && h < (1L << 60)))
  }
}
