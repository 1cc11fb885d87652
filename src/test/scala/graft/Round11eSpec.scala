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

  test("hrw/mod shard SQL contract: hash60 of the exact salted strings") {
    // modShard must equal hash60('mod:' || key) % n so the oracle can replay it
    val one = Seq(123L).toDF("k")
    val got = one.select(Sharding.modShard(col("k"), 7).as("m"),
      pmod(PortableHash.hash60(lit("mod:123")), lit(7L)).as("e")).collect().head
    assert(got.getAs[Long]("m") === got.getAs[Long]("e"))
  }
}
