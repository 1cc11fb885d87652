package graft

import org.apache.spark.sql.functions._
import graft.ext.{PortableHash, Rank, Sampling, Sharding, TextAnalysis}

/** Round-11 fifth tranche: HRW sharding, DSIR importance weights, exact Gini
  * skew stats, letter-entropy fragments, and the n-gram multiset HOF. */
class Round11eSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- Sharding.hrwShard

  test("hrwShard: deterministic, in range, and stable under shard growth except the stolen slice") {
    val keys = (1L to 400L).toDF("k")
    val r = keys.select(col("k"),
      Sharding.hrwShard(col("k"), 8).as("s8"),
      Sharding.hrwShard(col("k"), 9).as("s9")).collect()
    assert(r.forall(x => x.getAs[Int]("s8") >= 0 && x.getAs[Int]("s8") < 8))
    assert(r.forall(x => x.getAs[Int]("s9") >= 0 && x.getAs[Int]("s9") < 9))
    // HRW invariant: a key moves 8 -> 9 ONLY to the new shard (id 8).
    assert(r.filter(x => x.getAs[Int]("s8") != x.getAs[Int]("s9"))
      .forall(_.getAs[Int]("s9") == 8))
    // re-evaluation is identical (pure row function)
    val again = keys.select(Sharding.hrwShard(col("k"), 8).as("s8")).collect()
    assert(r.map(_.getAs[Int]("s8")).toSeq === again.map(_.getAs[Int]("s8")).toSeq)
  }

  test("rebalanceAudit: hrw moves ~1/9 of keys, mod moves the vast majority") {
    val keys = (1L to 900L).toDF("k")
    val rows = Sharding.rebalanceAudit(keys, "k", 8, 9).collect()
      .map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("n_moved"), r.getAs[Long]("moved_permille")))
      .toMap
    val (nH, mH, pH) = rows("hrw")
    val (nM, mM, pM) = rows("mod")
    assert(nH === 900L && nM === 900L)
    assert(pH === mH * 1000 / 900 && pM === mM * 1000 / 900)
    // expectation: hrw ~ 100/900 = 111 permille, mod ~ 8/9 = 889 permille
    assert(pH > 40 && pH < 250, s"hrw moved_permille $pH out of band")
    assert(pM > 700, s"mod moved_permille $pM out of band")
  }

  // ---------------------------------------------------------- Rank.giniStats

  test("giniStats: exact values on known distributions, ties handled exactly") {
    graft.engine.Scratch.withTempDir("gini-spec-") { tmp =>
      // uniform sizes -> Gini 0
      val eq = Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("id", "sz")
      val r1 = Rank.giniStats(eq, "sz", "id", s"$tmp/a").collect().head
      val (n1, t1, s1) = (r1.getLong(0),
        r1.getDecimal(1).longValueExact(), r1.getDecimal(2).longValueExact())
      assert((2 * s1 - (n1 + 1) * t1) === 0L)
      // [1, 3]: G = (2*(1*1 + 2*3) - 3*4) / (2*4) = 2/8 = 250 permille
      val ab = Seq(("a", 1L), ("b", 3L)).toDF("id", "sz")
      val r2 = Rank.giniStats(ab, "sz", "id", s"$tmp/b").collect().head
      val (n2, t2, s2) = (r2.getLong(0),
        r2.getDecimal(1).longValueExact(), r2.getDecimal(2).longValueExact())
      assert((2 * s2 - (n2 + 1) * t2) * 1000 / (n2 * t2) === 250L)
      // ties: [2, 2, 8] via block formula equals any row_number assignment:
      // S = 1*2 + 2*2 + 3*8 = 30
      val tie = Seq(("a", 2L), ("b", 2L), ("c", 8L)).toDF("id", "sz")
      val r3 = Rank.giniStats(tie, "sz", "id", s"$tmp/c").collect().head
      assert(r3.getDecimal(2).longValueExact() === 30L)
    }
  }

  // ------------------------------------------------------------ Sampling DSIR

  test("dsir: target-exclusive buckets weigh positive, source-exclusive negative") {
    // 2 docs: doc 1 (target) repeats 'aaa', doc 2 (source-only) repeats 'bbb';
    // they hash to different buckets with overwhelming probability.
    val toks = Seq.fill(10)((1L, "en", "aaa")) ++ Seq.fill(10)((2L, "de", "bbb"))
    val df = toks.toDF("doc_id", "lang", "token")
    val ratios = Sampling.dsirLogRatioMicros(df, "token", col("lang") === "en")
    val w = Sampling.dsirDocWeights(df, "doc_id", "token", ratios)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_micros")).toMap
    assert(w(1L) > 0L, s"target doc weight ${w(1L)} should be positive")
    assert(w(2L) < 0L, s"source-only doc weight ${w(2L)} should be negative")
    // ratio table is bucket-keyed and deterministic
    val again = Sampling.dsirDocWeights(df, "doc_id", "token", ratios).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("weight_micros")).toMap
    assert(again === w)
  }

  // ----------------------------------------------- TextAnalysis letter entropy

  test("letter entropy: uniform letters hit ln(k) micros, single letter hits 0") {
    val docs = Seq((1L, "abcd"), (2L, "zzzz")).toDF("doc_id", "text")
    val cnts = docs.selectExpr("doc_id" +: TextAnalysis.letterCountCols("lower(text)"): _*)
    val h = cnts.select(col("doc_id"),
        expr(TextAnalysis.letterEntropyMicrosExpr("DIV")).as("h"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("h")).toMap
    // 4 distinct letters once each: H = ln 4 = 1386294 micros (exact:
    // round(1e6*ln4) - 4*round(1e6*ln1)/4 = 1386294 - 0)
    assert(h(1L) === math.round(1e6 * math.log(4.0)))
    // one letter: ln 4 - (4*ln 4)/4 = 0
    assert(h(2L) === 0L)
  }

  // ------------------------------------------------------ TextAnalysis.allGrams

  test("allGrams keeps duplicates and order; short docs yield empty") {
    val r = Seq("a b a b", "solo").toDF("text")
      .select(TextAnalysis.allGrams(col("text"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) === Seq("a b", "b a", "a b"))
    assert(r(1) === Seq.empty)
  }

  // -------------------------------------------------- Labels Dawid–Skene step

  test("weightedRelabel: reliable raters outvote a noisy majority") {
    // 3 items; raters 1,2 always agree with each other ('A'), raters 3,4,5
    // vote 'B' on item 3 only — majority there is B, but after reweighting
    // by agreement (raters 1,2 agree with majority on 2/3 items = 666;
    // raters 3,4,5 on 3/3 = 1000) item 3 stays B (3000 vs 1332): weighted
    // == majority. On a spread where the reliable pair flips it, check flip.
    val votes = Seq(
      (1L, 1, "A"), (1L, 2, "A"), (1L, 3, "A"), (1L, 4, "B"), (1L, 5, "B"),
      (2L, 1, "A"), (2L, 2, "A"), (2L, 3, "A"), (2L, 4, "B"), (2L, 5, "B"),
      (3L, 1, "A"), (3L, 2, "A"), (3L, 3, "B"), (3L, 4, "B"), (3L, 5, "B")
    ).toDF("item", "rater", "label")
    // agreement: raters 1,2: items 1,2 maj=A (agree), item 3 maj=B (disagree)
    //   -> 666; rater 3: A,A,B all = maj -> 1000; raters 4,5: B,B,B -> 333
    val ra = graft.ext.Labels.raterAgreement(votes, col("item"), col("rater"), col("label"))
      .collect().map(r => r.getAs[Int]("rater") -> r.getAs[Long]("agree_permille")).toMap
    assert(ra(1) === 666L && ra(2) === 666L && ra(3) === 1000L)
    assert(ra(4) === 333L && ra(5) === 333L)
    val out = graft.ext.Labels.weightedRelabel(votes, col("item"), col("rater"), col("label"))
      .collect().map(r => r.getAs[Long]("item") ->
        (r.getAs[String]("maj_label"), r.getAs[String]("weighted_label"))).toMap
    // item 1: maj A; weighted: A mass = 666+666+1000 = 2332, B = 666 -> A
    assert(out(1L) === ("A", "A"))
    // item 3: maj B; weighted: A = 1332, B = 1000+333+333 = 1666 -> B
    assert(out(3L) === ("B", "B"))
  }

  // ------------------------------------------------ Fuzzy Fellegi–Sunter

  test("fsFieldWeights: u from data frequencies, clamped; agree weight beats disagree") {
    // field x: two values 50/50 -> u = (2*4)*1000/16 = 500 permille
    val recs = Seq("a", "a", "b", "b").toDF("x")
    val w = graft.ext.Fuzzy.fsFieldWeights(recs, Seq(("x", 900L))).collect().head
    assert(w.getAs[Long]("u_permille") === 500L)
    assert(w.getAs[Long]("w_agree_micros") === math.round(1e6 * math.log(900.0 / 500.0)))
    assert(w.getAs[Long]("w_disagree_micros") === math.round(1e6 * math.log(100.0 / 500.0)))
    // all-distinct field clamps u to 1 rather than ln(inf)
    val dist = Seq("a", "b", "c", "d").toDF("x")
    val w2 = graft.ext.Fuzzy.fsFieldWeights(dist, Seq(("x", 900L))).collect().head
    assert(w2.getAs[Long]("u_permille") === 250L) // 4*1*1000/16
    val const = Seq("a", "a", "a", "a").toDF("x")
    val w3 = graft.ext.Fuzzy.fsFieldWeights(const, Seq(("x", 900L))).collect().head
    assert(w3.getAs[Long]("u_permille") === 999L) // clamped from 1000
  }

  test("fsScores: blocked pairs sum per-field agree/disagree weights") {
    val l = Seq((1L, "b1", "x", "p")).toDF("id", "blk", "f1", "f2")
    val r = Seq((2L, "b1", "x", "q"), (3L, "b2", "x", "p")).toDF("id", "blk", "f1", "f2")
    val wdf = Seq(("f1", 900L, 500L, 100L, -200L), ("f2", 900L, 500L, 300L, -400L))
      .toDF("field", "m_permille", "u_permille", "w_agree_micros", "w_disagree_micros")
    val out = graft.ext.Fuzzy.fsScores(l, "id", r, "id", "blk", wdf, Seq("f1", "f2"))
      .collect().map(x => (x.getAs[Long]("left_id"), x.getAs[Long]("right_id"),
        x.getAs[Long]("score_micros")))
    // only the in-block pair (1,2): f1 agrees (+100), f2 disagrees (-400)
    assert(out.toSeq === Seq((1L, 2L, -300L)))
  }

  // ---------------------------------------------------- Similarity.mmrSelect

  test("mmrSelect: picks relevant-but-diverse; a near-duplicate of pick 1 is deferred") {
    // query 0 = e1; candidates: 1 (identical to query), 2 (= 1, a near dup),
    // 3 (orthogonal-ish mix). At lambda .3 the redundancy term dominates:
    // step 2 scores dup2 (300·1e6 − 700·~1e6)/1000 ≈ −400000 vs
    // cand3 (300·6e5 − 700·6e5)/1000 = −240000 → the dup defers to step 3.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.999f, 0.001f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val picks = graft.ext.Similarity.mmrSelect(vecs, 0, poolSize = 3, k = 3,
      lambdaPermille = 300).collect()
    assert(picks.map(_.getAs[Int]("step")).toSeq === Seq(1, 2, 3))
    val ids = picks.map(_.getAs[Long]("vec_id")).toSeq
    assert(ids.head === 1L)        // highest relevance first
    assert(ids(1) === 3L, s"dup picked second: $ids") // diversity defers the dup
    assert(ids(2) === 2L)
    // step 1 mmr == rel
    assert(picks.head.getAs[Long]("mmr_micros") === picks.head.getAs[Long]("rel_micros"))
  }

  // ---------------------------------------------- TextAnalysis unigram LM

  test("unigramLmCosts: reference-frequent tokens are cheap, unseen tokens pay max") {
    // ref rows: 'the' x3, 'cat' x1; non-ref adds 'zzz' (unseen in ref).
    // T_ref = 4, V = 3: cost(the) = ln(7/4), cost(cat) = ln(7/2),
    // cost(zzz) = ln(7/1) — the maximum.
    val toks = Seq(("r", "the"), ("r", "the"), ("r", "the"), ("r", "cat"),
      ("s", "zzz")).toDF("slice", "w")
    val c = graft.ext.TextAnalysis.unigramLmCosts(toks, "w", col("slice") === "r")
      .collect().map(r => r.getAs[String]("w") -> r.getAs[Long]("cost_micros")).toMap
    assert(c("the") === math.round(1e6 * math.log(7.0 / 4.0)))
    assert(c("cat") === math.round(1e6 * math.log(7.0 / 2.0)))
    assert(c("zzz") === math.round(1e6 * math.log(7.0 / 1.0)))
    assert(c("zzz") > c("cat") && c("cat") > c("the"))
  }

  test("docLmCosts: mean token cost with integer DIV") {
    val toks = Seq((1L, "a"), (1L, "b"), (2L, "a")).toDF("doc_id", "w")
    val costs = Seq(("a", 0L, 100L), ("b", 0L, 301L))
      .toDF("w", "c_ref", "cost_micros")
    val d = graft.ext.TextAnalysis.docLmCosts(toks, "doc_id", "w", costs)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cost_micros"))).toMap
    assert(d(1L) === ((2L, 200L))) // (100+301) DIV 2
    assert(d(2L) === ((1L, 100L)))
  }

  // ------------------------------------------------- Graph.hitsAuthorities

  test("hitsAuthorities: the max authority is pinned at 1e6 and degree order holds") {
    // star: hubs 1,2,3 all point to auth 10; hub 1 also points to auth 11.
    // Round 1: a(10) = 3e6 -> 1e6 (max), a(11) = 1e6 -> 333333.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)).toDF("src", "dst")
    val a = graft.ext.Graph.hitsAuthorities(edges, iters = 1)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("auth_micros")).toMap
    assert(a(10L) === 1000000L)
    assert(a(11L) === 333333L)
    // a second round keeps the ordering and the 1e6 pin
    val a2 = graft.ext.Graph.hitsAuthorities(edges, iters = 2)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("auth_micros")).toMap
    assert(a2(10L) === 1000000L && a2(11L) < 1000000L)
  }

  test("mixtureQuotas with sqrt weights: quotas sum exactly to the budget") {
    val counts = Seq(("en", 400L), ("de", 100L), ("fr", 25L)).toDF("lang", "n")
      .withColumn("wm", expr("CAST(ROUND(1e6 * sqrt(n)) AS BIGINT)"))
    val q = graft.ext.Sampling.mixtureQuotas(counts, "lang", "wm", 1000)
      .collect().map(r => r.getAs[String]("group") -> r.getAs[Long]("quota")).toMap
    assert(q.values.sum === 1000L)
    // sqrt flattening: en share drops from 400/525=762 to 20/35=571 permille
    assert(q("en") === 571L || q("en") === 572L)
    assert(q("fr") > 47L) // raw share would be 47; sqrt lifts it to ~143
  }

  // ---------------------------------------------------------- ext.Chunking

  test("cdcChunks: chunks concatenate back to the text, in order") {
    val full = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, full), (2L, "tiny")).toDF("doc_id", "text")
    val byDoc = graft.ext.Chunking.cdcChunks(docs, "doc_id", "text")
      .collect().groupBy(_.getAs[Long]("doc"))
    // chunk characters must rebuild the exact text (collect order is not
    // guaranteed, so compare as multisets)
    val d1 = byDoc(1L).map(_.getAs[String]("chunk")).mkString("")
    assert(d1.sorted === full.sorted)
    assert(d1.length === full.length)
    assert(byDoc(2L).map(_.getAs[String]("chunk")).toSeq === Seq("tiny"))
  }

  test("cdcChunks re-synchronize after a prefix edit; fixed chunks do not") {
    val text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
    val docs = Seq((1L, text), (2L, text.drop(6))).toDF("doc_id", "text")
    val cdc = graft.ext.Chunking.cdcChunks(docs, "doc_id", "text").collect()
    val c1 = cdc.filter(_.getAs[Long]("doc") == 1L).map(_.getAs[String]("chunk")).toSet
    val c2 = cdc.filter(_.getAs[Long]("doc") == 2L).map(_.getAs[String]("chunk")).toSet
    val cdcShared = (c1 intersect c2).size
    val fx = graft.ext.Chunking.fixedChunks(docs, "doc_id", "text", 16).collect()
    val f1 = fx.filter(_.getAs[Long]("doc") == 1L).map(_.getAs[String]("chunk")).toSet
    val f2 = fx.filter(_.getAs[Long]("doc") == 2L).map(_.getAs[String]("chunk")).toSet
    val fixedShared = (f1 intersect f2).size
    assert(cdcShared > fixedShared,
      s"CDC shared $cdcShared chunks, fixed shared $fixedShared — CDC must win")
    assert(cdcShared >= 3, s"CDC should re-sync after the edit, shared only $cdcShared")
  }

  // ------------------------------------------ Fuzzy.sortedNeighborhoodPairs

  test("sortedNeighborhoodPairs: exactly the ordinal-distance-w pairs, each once") {
    graft.engine.Scratch.withTempDir("sn-spec-") { tmp =>
      val recs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
        .toDF("id", "k")
      val pairs = graft.ext.Fuzzy.sortedNeighborhoodPairs(recs, "id", "k", 2, tmp)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).sorted
      // sorted order = a..e; distance <= 2 pairs: (1,2)(1,3)(2,3)(2,4)(3,4)(3,5)(4,5)
      assert(pairs.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
        (3L, 4L), (3L, 5L), (4L, 5L)))
    }
  }

  // ----------------------------------------------------- Profile.klDrift

  test("klDrift: zero on identical slices, positive and asymmetric on drift") {
    val a = Seq("x", "x", "x", "y").toDF("cat")
    val same = graft.engine.Profile.klDrift(a, a, "cat").collect().head
    assert(same.getAs[Long]("kl_ab_micros") === 0L)
    assert(same.getAs[Long]("kl_ba_micros") === 0L)
    val b = Seq("x", "y", "y", "y").toDF("cat")
    val drift = graft.engine.Profile.klDrift(a, b, "cat").collect().head
    assert(drift.getAs[Long]("kl_ab_micros") > 0L)
    assert(drift.getAs[Long]("kl_ba_micros") > 0L)
    assert(drift.getAs[Long]("n_categories") === 2L)
    // hand value: p=(4/6, 2/6), q=(2/6, 4/6): KL = (4/6)ln2 + (2/6)ln(1/2)
    // with add-one smoothing counts (3+1,1+1)/(4+2) vs (1+1,3+1)/(4+2)
    val expected = Math.round(1e6 * (4.0 / 6) * math.log(2.0)) +
      Math.round(1e6 * (2.0 / 6) * math.log(0.5))
    assert(drift.getAs[Long]("kl_ab_micros") === expected)
  }

  // -------------------------------------------- Packing.tokenBalancedShards

  test("tokenBalancedShards: every doc assigned once, shards token-balanced") {
    graft.engine.Scratch.withTempDir("tbs-spec-") { tmp =>
      val docs = (1L to 100L).map(i => (i, 1L + i % 7)).toDF("id", "toks")
      val out = graft.ext.Packing.tokenBalancedShards(docs, "id", "toks", 4, tmp)
        .collect()
      assert(out.length === 100)
      assert(out.map(_.getAs[Long]("id")).toSet === (1L to 100L).toSet)
      val byShard = out.groupBy(_.getAs[Long]("shard"))
        .map { case (s, rs) => s -> rs.map(_.getAs[Long]("toks")).sum }
      assert(byShard.keySet.forall(s => s >= 0 && s < 4))
      // prefix-sum partitioner bound: every shard within one max-doc of T/4
      val t = byShard.values.sum; val maxDoc = 7L
      assert(byShard.values.forall(v => (v - t / 4).abs <= 2 * maxDoc),
        s"imbalanced: $byShard")
    }
  }

  // ------------------------------------------------------ Privacy.dpHistogram

  test("dpHistogram: deterministic, abs_err consistent, noise actually present") {
    val df = (Seq.fill(40)("x") ++ Seq.fill(10)("y") ++ Seq.fill(3)("z")).toDF("cat")
    def run() = graft.ext.Privacy.dpHistogram(df, "cat").collect()
      .map(r => r.getAs[String]("cat") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_noisy"), r.getAs[Long]("abs_err")))
      .toMap
    val a = run(); val b = run()
    assert(a === b) // hash draws, not RNG
    assert(a("x")._1 === 40L && a("y")._1 === 10L && a("z")._1 === 3L)
    assert(a.values.forall { case (t, n, e) => e == (n - t).abs })
    // with 3 categories and geometric noise, at least one count moved
    assert(a.values.exists { case (_, _, e) => e > 0L })
  }

  test("hrw/mod shard SQL contract: hash60 of the exact salted strings") {
    // modShard must equal hash60('mod:' || key) % n so the oracle can replay it
    val one = Seq(123L).toDF("k")
    val got = one.select(Sharding.modShard(col("k"), 7).as("m"),
      pmod(PortableHash.hash60(lit("mod:123")), lit(7L)).as("e")).collect().head
    assert(got.getAs[Long]("m") === got.getAs[Long]("e"))
  }
}
