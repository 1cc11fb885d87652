package graft

import graft.ext.{HeavyHitters, Rank, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-9 additions: BPE merge learning, exact rolling distinct, Misra–Gries
  * heavy hitters, KS drift, and contiguous total-order sharding. */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- BPE

  test("bpeMerges learns the hand-checkable merge sequence of a tiny corpus") {
    // Corpus: "abab abab ab" → words {abab:2, ab:1}.
    // Round 1 pairs: (a,b) weight 2·2+1=5... wait: abab has pairs (a,b),(b,a),(a,b)
    //   → (a,b): 2 per 'abab' ×2 + 1 per 'ab' = 5; (b,a): 1 ×2 = 2. Winner (a,b).
    // Applying ·a·b·→·ab·: 'abab' = ·a·b·a·b· → first match consumes [0,5) →
    //   continue from 'a·b·' (no leading ·) → ·ab·a·b·? NO: the remainder
    //   "a·b·" is appended verbatim, so seq = ·ab·a·b·. One merge per pass —
    //   the second (a,b) survives to round 2.
    // Round 2 pairs over {·ab·a·b·:2, ·ab·:1}: (ab,a):2, (a,b):2, (b,ab)? none.
    //   Tie 2 vs 2 → lexicographic: (a,b) < (ab,a) → winner (a,b) again.
    val docs = Seq("abab abab ab").toDF("text")
    val got = TextAnalysis.bpeMerges(docs, col("text"), rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got(0) === ((1, "a", "b", 5L)))
    assert(got(1) === ((2, "a", "b", 2L)))
  }

  test("bpeMerges merged symbols participate as single units in later rounds") {
    // "xy xy xyz": round 1 merges (x,y) cnt 3. Round 2 the only adjacent pair
    // left is (xy, z) cnt 1 — the merged symbol must act as one unit.
    val docs = Seq("xy xy xyz").toDF("text")
    val got = TextAnalysis.bpeMerges(docs, col("text"), rounds = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got(0) === ((1, "x", "y", 3L)))
    assert(got(1) === ((2, "xy", "z", 1L)))
  }

  test("bpeMerges ignores non-[a-z0-9] words and uses word frequency as weight") {
    // 'Héllo' is dropped by the ascii filter; 'aa' ×3 dominates.
    val docs = Seq("aa aa", "aa Héllo!!").toDF("text")
    val got = TextAnalysis.bpeMerges(docs, col("text"), rounds = 1).collect()
    assert(got.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      === Seq(("a", "a", 3L)))
  }

  // ------------------------------------------------- rolling distinct

  test("rollingDistinct counts an entity once per window even with many active days") {
    // u1 active on d1, d2, d3 (all within one 7-day window); u2 on d1 only.
    val df = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 10:00:00"),
      (1L, "2024-01-03 10:00:00"), (2L, "2024-01-01 23:59:59"))
      .toDF("u", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.rollingDistinct(df, "u", "ts", windowDays = 7)
      .orderBy("window_day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // Window days = the 3 active days; u1 contributes to all, u2 to all
    // (d1+6 covers them), so each day counts 2.
    assert(got === Array(("2024-01-01", 2L), ("2024-01-02", 2L), ("2024-01-03", 2L)))
  }

  test("rollingDistinct expires entities outside the trailing window") {
    val df = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-09 00:00:00"))
      .toDF("u", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.rollingDistinct(df, "u", "ts", windowDays = 7)
      .orderBy("window_day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // Jan 9 is 8 days after Jan 1 — u1 has aged out.
    assert(got === Array(("2024-01-01", 1L), ("2024-01-09", 1L)))
  }

  test("rollingDistinct matches the naive per-day count-distinct on random data") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(400)((rnd.nextInt(25).toLong,
      s"2024-02-${"%02d".format(1 + rnd.nextInt(28))} 12:00:00"))
    val df = rows.toDF("u", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.rollingDistinct(df, "u", "ts", windowDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val byDay = rows.map { case (u, ts) => (u, ts.take(10)) }.distinct
    val days = byDay.map(_._2).distinct
    val naive = days.map { d =>
      d -> byDay.filter { case (_, ad) =>
        ad <= d && java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(ad), java.time.LocalDate.parse(d)) <= 6
      }.map(_._1).distinct.size.toLong
    }.toMap
    assert(got === naive)
  }

  // ---------------------------------------------------- heavy hitters

  test("MisraGries summary is a superset of true heavy keys under adversarial order") {
    // Stream engineered so rare keys arrive between heavy runs: 3 heavy keys
    // (freq 40 each) + 80 singletons, n = 200, capacity 4 → guarantee
    // threshold n/5 = 40: every key with freq > 40... use 50 to be clearly
    // above. Shuffle deterministically; the summary must retain the heavy keys
    // whatever the partition/merge order.
    val heavy = Seq.fill(50)("h1") ++ Seq.fill(50)("h2") ++ Seq.fill(50)("h3")
    val noise = (1 to 50).map(i => s"r$i")
    val stream = new scala.util.Random(7).shuffle(heavy ++ noise)
    val df = stream.toDF("k").repartition(7) // force multi-partition merges
    val summary = df.agg(HeavyHitters.misraGries(4)(col("k"))).head()
      .getAs[Map[String, Long]](0)
    assert(summary.size <= 4)
    assert(Set("h1", "h2", "h3").subsetOf(summary.keySet),
      s"heavy keys missing from $summary")
  }

  test("exactHeavyHitters equals the full groupBy answer (pruning regime)") {
    val rnd = new scala.util.Random(11)
    // Zipf-ish: key i appears ~ 1000/i times, many distinct keys, capacity 10.
    val stream = (1 to 60).flatMap(i => Seq.fill(1000 / i)(s"k$i"))
    val df = rnd.shuffle(stream).toDF("k").repartition(5)
    val got = HeavyHitters.exactHeavyHitters(df, col("k"), capacity = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val n = stream.size
    val expected = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .filter { case (_, c) => c * 11 > n }.toSet
    assert(expected.nonEmpty, "test must exercise a nonempty answer")
    assert(got === expected)
  }

  test("exactHeavyHitters on an empty stream returns an empty typed frame") {
    val df = Seq.empty[String].toDF("k")
    val out = HeavyHitters.exactHeavyHitters(df, col("k"), capacity = 5,
      keyName = "token")
    assert(out.columns.toSeq === Seq("token", "cnt"))
    assert(out.count() === 0)
  }

  // --------------------------------------------------------- KS drift

  test("ksDrift is zero for identical distributions and maximal for disjoint ones") {
    val a = (1L to 100L).toDF("v")
    val same = Rank.ksDrift(a, (1L to 100L).toDF("v"), "v", numPartitions = 4).head()
    assert(same.getAs[Long]("ks_num") === 0L)
    val b = (101L to 200L).toDF("v")
    val disj = Rank.ksDrift(a, b, "v", numPartitions = 4).head()
    // At v=100: cumA=100, cumB=0 → |100·100 − 0·100| = 10000 = nA·nB (KS=1).
    assert(disj.getAs[Long]("ks_num") === 10000L)
    assert(disj.getAs[Long]("ks_at") === 100L)
    assert(disj.getAs[Long]("n_values") === 200L)
  }

  test("ksDrift matches the single-partition window oracle on random data") {
    val rnd = new scala.util.Random(13)
    val a = Seq.fill(500)(rnd.nextInt(40).toLong).toDF("v")
    val b = Seq.fill(300)((rnd.nextInt(40) + rnd.nextInt(10)).toLong).toDF("v")
    val got = Rank.ksDrift(a, b, "v", numPartitions = 5).head()
    // Naive oracle: global-order running sums in one window.
    val ca = a.groupBy("v").count().withColumnRenamed("count", "ca")
    val cb = b.groupBy("v").count().withColumnRenamed("count", "cb")
    val m = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val naive = m.withColumn("cuma", sum("ca").over(w))
      .withColumn("cumb", sum("cb").over(w))
      .withColumn("diff", abs(col("cuma") * 300L - col("cumb") * 500L))
      .orderBy(desc("diff"), asc("v")).limit(1).head()
    assert(got.getAs[Long]("ks_num") === naive.getAs[Long]("diff"))
    assert(got.getAs[Long]("ks_at") === naive.getAs[Long]("v"))
  }

  // ------------------------------------------- co-occurrence + fusion

  test("cooccurrenceLift counts each pair once per document with exact lift terms") {
    // d1 {a,b}, d2 {a,b,c}, d3 {b,c} — 'a a b' proves within-doc dedupe.
    val docs = Seq((1L, "a a b"), (2L, "a b c"), (3L, "b c")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis
      .cooccurrenceLift(docs, "doc_id", col("text"), k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got === Array(
      ("a", "b", 2L, 2L, 3L, 3L, 6L, 6L),
      ("b", "c", 2L, 3L, 2L, 3L, 6L, 6L),
      ("a", "c", 1L, 2L, 2L, 3L, 3L, 4L)))
  }

  test("rrfFuse sums integer reciprocal ranks and handles one-list documents") {
    val lex = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val sem = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val got = graft.ext.TextAnalysis.rrfFuse(lex, sem, "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // doc2: 10⁶/62 + 10⁶/61 = 16129 + 16393; doc1: 10⁶/61; doc3: 10⁶/62.
    assert(got === Array((2L, 32522L), (1L, 16393L), (3L, 16129L)))
  }

  // --------------------------------------- bootstrap + cardinality

  test("bootstrapReplicas matches a per-replica filter computation exactly") {
    val df = (1L to 500L).map(i => (i, i * 3L)).toDF("id", "v")
    val got = graft.ext.Sampling
      .bootstrapReplicas(df, col("id"), col("v"), replicas = 4, salt = "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    // Replica 2 recomputed independently via the same portable hash.
    val member2 = graft.ext.PortableHash.hash60(
      concat_ws(":", lit("t"), lit("2"), col("id").cast("string"))) % 2L === 0L
    val probe = df.filter(member2)
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(got(2L) === ((probe.getLong(0), probe.getLong(1))))
    // Memberships are ~half and differ across replicas (not degenerate).
    assert(got.values.map(_._1).toSet.size > 1 ||
      got.values.forall(n => n._1 > 150 && n._1 < 350))
  }

  test("keyCardinalityHistogram inverts to the exact key multiset") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 4L).toDF("k")
    val got = graft.engine.Profile.keyCardinalityHistogram(df, col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(3L -> 1L, 2L -> 2L, 1L -> 1L))
  }

  // --------------------------------------------------- event paths

  test("topPaths stacks leads per user and never crosses user boundaries") {
    val e = Seq(
      (1L, "A", 1L, 10L), (1L, "B", 2L, 20L), (1L, "C", 3L, 30L),
      (1L, "D", 4L, 40L),                       // user 1: ABC, BCD
      (2L, "X", 5L, 10L), (2L, "Y", 6L, 20L),   // user 2: too short
      (3L, "A", 7L, 10L), (3L, "B", 8L, 20L), (3L, "C", 9L, 30L))
      .toDF("user_id", "event_type", "event_id", "us")
    val got = graft.ext.Sessionize.topPaths(e, col("user_id"), col("event_type"),
      Seq(col("us"), col("event_id")), len = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === Array(("A", "B", "C", 2L), ("B", "C", "D", 1L)))
  }

  // --------------------------------------- join-view maintenance

  test("maintainJoinView equals the full recomputed join under mixed deltas") {
    val rnd = new scala.util.Random(29)
    val a0 = (1L to 40L).map(k => (k, s"seg${k % 5}")).toDF("k", "seg")
    val b0 = (1L to 120L).map(i => (1L + rnd.nextInt(40).toLong, i, i * 10L))
      .toDF("k", "ok", "v")
    val v0 = a0.join(b0, Seq("k"))
    // Mixed delta: segment updates on A, value updates on B, a full DELETE
    // of key 7 from A, and a B row MOVED from key 9 to key 10.
    val a1 = a0.filter(col("k") =!= 7L)
      .withColumn("seg", when(col("k") % 4 === 0, lit("SEG_D")).otherwise(col("seg")))
    val b1 = b0.withColumn("v", when(col("ok") % 6 === 0, col("v") + 1L).otherwise(col("v")))
      .withColumn("k", when(col("k") === 9L, 10L).otherwise(col("k")))
    val touched = (Seq(7L, 9L, 10L) ++ (1L to 40L).filter(_ % 4 == 0)
      ++ b0.filter(col("ok") % 6 === 0).select("k").collect().map(_.getLong(0)))
      .distinct.toDF("k")
    val maintained = graft.engine.Cdc.maintainJoinView(v0, a1, b1, touched, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val full = a1.join(b1, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(maintained === full)
    assert(!full.exists(_._1 == 7L), "deleted key must vanish from the view")
  }

  // ------------------------------------------- prefix-filter Jaccard

  test("prefixFilterJaccardPairs finds the hand-checkable qualifying pairs") {
    val docs = Seq(
      (1L, "w x y z"),       // shingles {wxy, xyz}
      (2L, "w x y z"),       // identical → J = 1
      (3L, "a b c d e"),     // {abc, bcd, cde}
      (4L, "b c d e"),       // {bcd, cde} → inter 2, union 3, J = 2/3 ≥ 0.6
      (5L, "p q r s"))       // unrelated
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup
      .prefixFilterJaccardPairs(docs, k = 3, tauMilli = 600L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array((1L, 2L, 2L, 2L), (3L, 4L, 2L, 3L)))
  }

  test("prefixFilterJaccardPairs equals the naive quadratic join on random corpora") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = (1L to 40L).map { i =>
      (i, Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // Planted truncated copies guarantee qualifying pairs; random base docs
    // exercise the organic (mostly sub-threshold) background.
    val docs = (base ++ base.take(12).map { case (i, t) =>
      (i + 1000L, t.split(" ").drop(1).mkString(" "))
    }).toDF("doc_id", "text")
    val fast = graft.ext.Dedup
      .prefixFilterJaccardPairs(docs, k = 3, tauMilli = 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val sh = graft.ext.Dedup.shingleSets(docs, 3)
    val naive = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
      .crossJoin(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("i"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("u"))
      .filter(col("i") * 1000L >= col("u") * 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(naive.nonEmpty, "test must exercise qualifying pairs")
    assert(fast === naive)
  }

  // ----------------------------------------------------- ordered shards

  test("orderedShards covers 1..n contiguously with balanced sizes") {
    val df = (1L to 103L).map(i => (i, 1000L - i)).toDF("id", "key")
    val shards = Rank.orderedShards(df, Seq("key", "id"), "id",
      numShards = 8, numPartitions = 4)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(shards.map(_._1).toSeq === (0 until 8))
    // Contiguity: each shard's ordinal interval is exactly its row count and
    // chains onto the previous one.
    shards.foldLeft(0L) { case (prevMax, (_, nRows, minOrd, maxOrd, _)) =>
      assert(minOrd === prevMax + 1)
      assert(maxOrd - minOrd + 1 === nRows)
      maxOrd
    }
    assert(shards.map(_._2).sum === 103L)
    // Balanced: sizes differ by at most 1.
    val sizes = shards.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    // Order: key ascending = id descending, so shard 0 holds the LARGEST ids.
    assert(shards.head._5 === (91L to 103L).sum)
  }

  // ---------------------------------------------- centroid similarity

  test("centroidSimilarityMap emits exact integer dot ingredients per pair") {
    val emb = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)), // label 0 sum → [2000, 0]
      (1, Seq(0.0f, 2.0f)),                       // label 1 sum → [0, 2000]
      (2, Seq(1.0f, 2.0f)))                       // label 2 sum → [1000, 2000]
      .toDF("label", "embedding")
    val got = graft.ext.Similarity
      .centroidSimilarityMap(emb, "label", "embedding")
      .orderBy("label_a", "label_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got === Array(
      (0L, 1L, 2L, 1L, 0L, 4000000L, 4000000L),        // orthogonal
      (0L, 2L, 2L, 1L, 2000000L, 4000000L, 5000000L),
      (1L, 2L, 1L, 1L, 4000000L, 4000000L, 5000000L)))
  }

  test("centroidSimilarityMap is partition-order invariant (integer sums commute)") {
    val rnd = new scala.util.Random(19)
    val emb = Seq.fill(120)((rnd.nextInt(4),
      Seq.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("label", "embedding")
    val once = graft.ext.Similarity
      .centroidSimilarityMap(emb, "label", "embedding")
      .orderBy("label_a", "label_b").collect().toSeq
    val again = graft.ext.Similarity
      .centroidSimilarityMap(emb.repartition(7), "label", "embedding")
      .orderBy("label_a", "label_b").collect().toSeq
    assert(once === again)
  }

  test("orderedShards ordinal assignment matches a global row_number") {
    val rnd = new scala.util.Random(17)
    val df = (1L to 200L).map(i => (i, rnd.nextInt(1000).toLong * 1000L + i))
      .toDF("id", "key")
    val shards = Rank.orderedShards(df, Seq("key", "id"), "id",
      numShards = 5, numPartitions = 6).collect()
      .map(r => (r.getInt(0), r.getLong(4))).toMap
    val sorted = df.orderBy("key", "id").collect().map(_.getLong(0))
    val expected = sorted.zipWithIndex
      .groupBy { case (_, idx) => (idx.toLong * 5L / 200L).toInt }
      .map { case (s, rows) => s -> rows.map(_._1).sum }
    assert(shards === expected)
  }
}
