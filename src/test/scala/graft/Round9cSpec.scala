package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Labels, Rank, TimeSeries}

/** MemoryStream row types for the stream-stream join spec (top-level for
  * stable encoders). */
case class ViewEvent(user_id: Long, view_ts: java.sql.Timestamp, view_id: Long)
case class ClickEvent(click_user: Long, click_ts: java.sql.Timestamp, click_id: Long)

/** Round-9 late additions: sweep-line peak concurrency, trailing-median spike
  * detection, TWAP, Fleiss' kappa, canonicalization dedup, session-window
  * aggregation, quantile normalization. Every test is a hand-checkable
  * fixture (the sf-data correctness lives with the DuckDB oracle). */
class Round9cSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ peak concurrency

  test("peakConcurrency counts overlaps with end-exclusive boundaries") {
    // k: [0,10) [5,15) [10,20) — at t=10 the first interval closes BEFORE the
    // third opens (delta −1 sorts first), so the peak is 2, not 3.
    // j: one interval — peak 1.
    val df = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 10L, 20L), ("j", 0L, 7L))
      .toDF("key", "s", "e")
    val got = TimeSeries.peakConcurrency(df, "key", col("s"), col("e"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("j", 1L, 1L), ("k", 2L, 3L)))
  }

  test("intervalUnion merges overlapping and touching intervals, splits on gaps") {
    // k: [0,10) [5,15) [15,20) merge into one segment [0,20); [30,40) is its
    // own segment. covered = 20 + 10 = 30 over 4 intervals, 2 segments.
    val df = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 15L, 20L), ("k", 30L, 40L))
      .toDF("key", "s", "e")
    val got = TimeSeries.intervalUnion(df, "key", col("s"), col("e")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("k", 4L, 2L, 30L)))
  }

  test("peakConcurrency: back-to-back intervals never overlap") {
    val df = Seq(("k", 0L, 10L), ("k", 10L, 20L), ("k", 20L, 30L)).toDF("key", "s", "e")
    val got = TimeSeries.peakConcurrency(df, "key", col("s"), col("e")).collect()
    assert(got.head.getLong(1) === 1L)
  }

  // ------------------------------------------------ spike detection

  test("spikesVsTrailingMedian flags a 2.5x day and zero-fills missing days") {
    // Daily counts for key a: 01→2, 02→2, 03→2, 04→5, 05→2, 06→(absent ⇒ 0),
    // 07→1. With windowDays=3 only days 04+ have a full window:
    //   04: med(2,2,2)=2, 5·100 > 200·2 ⇒ spike
    //   05: med(2,2,5)=2, 2·100 ≤ 400  ⇒ no
    //   06: med(2,5,2)=2, 0            ⇒ no (and the day EXISTS despite no rows)
    //   07: med(5,2,0)=2, 1·100 ≤ 400  ⇒ no
    val rows = Seq("01" -> 2, "02" -> 2, "03" -> 2, "04" -> 5, "05" -> 2, "07" -> 1)
      .flatMap { case (d, n) => Seq.fill(n)(("a", s"2024-01-$d 12:00:00")) }
    val df = rows.toDF("key", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.spikesVsTrailingMedian(df, "key", "ts", windowDays = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      ("2024-01-04", 5L, 2L, true), ("2024-01-05", 2L, 2L, false),
      ("2024-01-06", 0L, 2L, false), ("2024-01-07", 1L, 2L, false)))
  }

  // ------------------------------------------------ TWAP

  test("twapPerKey integrates the step function and drops the last point") {
    // u: (t=0,v=100) (t=10,v=200) (t=30,v=0): 100·10 + 200·20 = 5000 over 30
    // ⇒ 166 (integer DIV). The t=30 point has no right endpoint.
    val df = Seq((7L, 0L, 100L), (7L, 10L, 200L), (7L, 30L, 0L)).toDF("u", "t", "v")
    val got = TimeSeries.twapPerKey(df, "u", col("t"), col("v")).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((7L, 2L, 30L, 166L)))
  }

  test("twapPerKey: a single observation per key yields no segments") {
    val df = Seq((1L, 5L, 42L)).toDF("u", "t", "v")
    assert(TimeSeries.twapPerKey(df, "u", col("t"), col("v")).count() === 0L)
  }

  // ------------------------------------------------ Fleiss' kappa

  test("fleissKappa matches the hand-computed 2x2 example (negative kappa)") {
    // item1: A,A; item2: A,B. A=2, B=4 ⇒ po=0.5. c=(3,1) ⇒ C=10, D=16 ⇒
    // pe=0.625. kappa = −0.125/0.375 = −1/3 ⇒ −333333 micro (truncated).
    val df = Seq((1, "A"), (1, "A"), (2, "A"), (2, "B")).toDF("item", "label")
    val r = Labels.fleissKappa(df, col("item"), col("label")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 2L, 2L)))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((500000L, 625000L, -333333L)))
  }

  test("fleissKappa is exactly 10^6 micro under perfect agreement") {
    val df = Seq((1, "A"), (1, "A"), (2, "B"), (2, "B")).toDF("item", "label")
    val r = Labels.fleissKappa(df, col("item"), col("label")).collect().head
    assert(r.getLong(3) === 1000000L && r.getLong(5) === 1000000L)
  }

  test("fleissKappa refuses unequal rater counts per item") {
    val df = Seq((1, "A"), (1, "A"), (2, "A")).toDF("item", "label")
    val e = intercept[Exception] {
      Labels.fleissKappa(df, col("item"), col("label")).collect()
    }
    assert(e.getMessage.contains("unequal rater counts")
      || Option(e.getCause).exists(_.getMessage.contains("unequal rater counts")))
  }

  // ------------------------------------------------ canonical dedup

  test("canonicalDuplicateGroups collapses case/punct/whitespace variants only") {
    val df = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  world"),
      (4L, "something else"), (5L, "something else"))
      .toDF("doc_id", "text")
    val got = Dedup.canonicalDuplicateGroups(df).orderBy("rep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 1/2/3 are one canonical group with 3 distinct raw texts; 4/5 are
    // byte-identical (1 raw variant); the singleton never appears.
    assert(got.toSeq === Seq((1L, 3L, 3L), (4L, 2L, 1L)))
  }

  // ------------------------------------------------ session windows (batch form)

  test("sessionAggregate merges at exactly-gap (inclusive) and splits past it (batch)") {
    // gap 30s, user 1: events at 0s/10s merge; 41s is 31s after 10s ⇒ new
    // session [41, 71). User 2: the second event lands EXACTLY 30s after the
    // first — Spark's session extension is INCLUSIVE, so it merges and the
    // session runs [0, 60).
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq((1L, ts(0), 100L), (1L, ts(10), 200L), (1L, ts(41), 50L),
      (2L, ts(0), 1L), (2L, ts(30), 2L))
      .toDF("user_id", "ts", "cents")
    val got = graft.engine.Incremental.sessionAggregate(df,
        ts = col("ts"), key = col("user_id"),
        gap = "30 seconds", watermarkDelay = "1 minute", valueCents = col("cents"))
      .select(col("user_id"), col("session_window.start").cast("long").as("s"),
        col("session_window.end").cast("long").as("e"), col("n"), col("value_cents"))
      .orderBy("user_id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((1L, 0L, 40L, 2L, 300L), (1L, 41L, 71L, 1L, 50L),
      (2L, 0L, 60L, 2L, 3L)))
  }

  // ------------------------------------------------ stream-stream join

  test("stream-stream interval join matches across micro-batch boundaries") {
    // view(u1, t=0) arrives in batch 1; its click (t=30min) in batch 2 —
    // the view must wait in state. click(u1, t=10min) arrives in batch 1
    // BEFORE its matching view (t=5min, batch 2) — the click must wait too.
    // click at t=2h matches nothing (outside the 1h window).
    // realistic epoch base — event times at/near epoch 0 sit on the initial
    // watermark boundary and can be dropped as late
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val views = MemoryStream[ViewEvent]
    val clicks = MemoryStream[ClickEvent]
    val joined = views.toDS().toDF().withWatermark("view_ts", "4 hours")
      .join(clicks.toDS().toDF().withWatermark("click_ts", "4 hours"), expr(
        """user_id = click_user AND
          |click_ts >= view_ts AND
          |click_ts <= view_ts + interval 1 hour""".stripMargin))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      views.addData(ViewEvent(1L, ts(0), 10L))
      clicks.addData(ClickEvent(1L, ts(10), 20L))
      q.processAllAvailable()
      views.addData(ViewEvent(1L, ts(5), 11L))
      clicks.addData(ClickEvent(1L, ts(30), 21L), ClickEvent(1L, ts(120), 22L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ss_join")
      .select("view_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // view 10 (t=0): clicks 20 (10min) + 21 (30min). view 11 (t=5): same two.
    // click 22 (2h) matches neither.
    assert(got === Set((10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L)))
  }

  // ------------------------------------------------ LSH index maintenance

  test("lshIndex incremental probes equal the full-corpus recompute, each pair once") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def text() = Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    def perturb(t: String) = t.split(" ").drop(1).mkString(" ")
    val base = (0L until 30L).map(i => (i, text()))
    val d1 = base.take(10).map { case (i, t) => (100L + i, perturb(t)) } ++
      Seq((113L, "omega omega shared tail words"), (114L, "omega omega shared tail words"))
    val d2 = base.slice(10, 20).map { case (i, t) => (200L + i, perturb(t)) } :+
      (210L, perturb(d1.head._2))
    val all = (base ++ d1 ++ d2).toDF("doc_id", "text")
    val expected = Dedup
      .minhashNearDuplicatesPortable(all, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    withTempDir { dir =>
      Dedup.lshIndexBuild(base.toDF("doc_id", "text"), s"$dir/idx")
      val p1 = Dedup.lshIndexProbeAppend(spark, s"$dir/idx",
          d1.toDF("doc_id", "text"), 1, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val p2 = Dedup.lshIndexProbeAppend(spark, s"$dir/idx",
          d2.toDF("doc_id", "text"), 2, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(p1.nonEmpty && p2.nonEmpty, "planted perturbations must match")
      assert(p1.intersect(p2).isEmpty, "a pair must be reported by exactly one batch")
      // batch n reports exactly the full-recompute pairs completed by batch n
      assert(p1 === expected.filter { case (_, b, _) => b >= 100L && b < 200L })
      assert(p2 === expected.filter { case (_, b, _) => b >= 200L })
      // incremental never reports a base-only pair
      assert((p1 ++ p2).forall { case (_, b, _) => b >= 100L })
    }
  }

  // ------------------------------------------------ FIFO allocation

  test("fifoMatch pairs supply and demand lots in arrival order, exactly") {
    // key k: supply lots 3,2 → unit ranges [0,3) [3,5); demand 4,1 →
    // [0,4) [4,5). FIFO pairs: (s1,d1)=3, (s2,d1)=1, (s2,d2)=1 → 3 pairs,
    // matched 5. key u: supply 10, demand 4 → matched 4 in one pair.
    // key d_only: demand 7, no supply → matched 0.
    val sup = Seq(("k", 3L, 1L), ("k", 2L, 2L), ("u", 10L, 1L)).toDF("key", "qty", "ord")
    val dem = Seq(("k", 4L, 1L), ("k", 1L, 2L), ("u", 4L, 1L), ("d_only", 7L, 1L))
      .toDF("key", "qty", "ord")
    val got = graft.engine.Joins.fifoMatch(sup, dem, "key", "qty", Seq("ord"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("d_only", 0L, 0L, 0L, 7L),
      ("k", 3L, 5L, 5L, 5L),
      ("u", 1L, 4L, 10L, 4L)))
  }

  // ------------------------------------------------ weighted median

  test("weightedMedian lands on the first value whose cumulative weight crosses half") {
    // values 1..4, weights 1/1/1/10: W=13, threshold 7 → the heavy value 4.
    val heavy = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 4L, 10L))
      .toDF("v", "id", "w")
    val r1 = graft.ext.Rank.weightedMedian(heavy, Seq("v", "id"), "v", "w",
      numPartitions = 3).collect().head
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3))
      === ((4L, 13L, 4L, 4L)))
    // uniform weights degenerate to the lower median (n=4 → rank 2 → value 2)
    val unif = Seq((1L, 1L, 1L), (2L, 2L, 1L), (3L, 3L, 1L), (4L, 4L, 1L))
      .toDF("v", "id", "w")
    val r2 = graft.ext.Rank.weightedMedian(unif, Seq("v", "id"), "v", "w",
      numPartitions = 3).collect().head
    assert((r2.getLong(2), r2.getLong(3)) === ((2L, 2L)))
  }

  // ------------------------------------------------ Holt / CUSUM

  test("holtLinearPerKey tracks a perfect ramp exactly at full weights") {
    // alpha=beta=1000: level = last value, trend = last step → forecast = next.
    val df = Seq((1L, 5L), (2L, 10L), (3L, 15L), (4L, 20L)).map { case (t, v) => ("k", t, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.holtLinearPerKey(df, "k", Seq("t"), "v",
        alphaPerMille = 1000L, betaPerMille = 1000L).collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4))
      === ((4L, 20L, 5L, 25L)))
  }

  test("holtLinearPerKey hand-checks one smoothing step and drops n<2 keys") {
    // [0,10,20], α=300 β=100: l0=0 b0=10; x=20 → l=13, b=(1300+9000)//1000=10.
    val df = Seq(("k", 1L, 0L), ("k", 2L, 10L), ("k", 3L, 20L), ("solo", 1L, 7L))
      .toDF("k", "t", "v")
    val got = TimeSeries.holtLinearPerKey(df, "k", Seq("t"), "v").collect()
    assert(got.length === 1, "single-point keys are dropped")
    assert((got.head.getLong(2), got.head.getLong(3), got.head.getLong(4))
      === ((13L, 10L, 23L)))
  }

  test("cusumChangepoint peaks at the level shift with earliest-day ties") {
    // counts 1,1,1,5,5,5 → scaled CUSUM |6·prefix − t·18| peaks (36) on day 3.
    val rows = Seq("01" -> 1, "02" -> 1, "03" -> 1, "04" -> 5, "05" -> 5, "06" -> 5)
      .flatMap { case (d, n) => Seq.fill(n)(("a", s"2024-01-$d 12:00:00")) }
    val df = rows.toDF("k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.cusumChangepoint(df, "k", "ts").collect().head
    assert((got.getDate(1).toString, got.getLong(2), got.getLong(3))
      === (("2024-01-03", 36L, 6L)))
  }

  // ------------------------------------------------ seasonality / Benford / overlap

  test("seasonalIndexByDow zero-fills span days and cross-multiplies exactly") {
    // 2024-01-01 is a Monday (dow 1 in the (epochDay+4)%7, 0=Sunday scheme).
    // Key a, span Mon..Sun (7 days): Mon 4 events, Wed 2, others 0 → mean
    // 6/7. Mon index = 4/(6/7) = 28/6 → 4666666 micro; Sun (0 events) → 0.
    val rows = Seq.fill(4)("2024-01-01 10:00:00") ++ Seq.fill(2)("2024-01-03 10:00:00") :+
      "2024-01-07 10:00:00"
    // the single Sunday event makes the span cover all 7 dows; drop it from
    // counts? No — keep: totals become 7 events; Mon = 4/(7/7) = 4.0.
    val df = rows.map(("a", _)).toDF("k", "ts").withColumn("ts", to_timestamp(col("ts")))
    val got = TimeSeries.seasonalIndexByDow(df, "k", "ts")
      .orderBy("dow").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // dows present: span 01-01..01-07 → each dow exactly once
    assert(got.length === 7 && got.forall(_._2 === 1L))
    val byDow = got.map(t => t._1 -> (t._3, t._4)).toMap
    assert(byDow(1) === ((4L, 4000000L)), "Monday: 4 events, index 4.0")
    assert(byDow(3) === ((2L, 2000000L)), "Wednesday: 2 events, index 2.0")
    assert(byDow(2) === ((0L, 0L)), "silent Tuesday: zero-filled, index 0")
  }

  test("benfordAudit: a perfectly-Benford count vector yields near-zero chi terms") {
    // 1000 values whose first digits follow the expected per-mille counts
    // exactly: digit d appears BenfordPermille(d) times.
    val vals = graft.engine.Profile.BenfordPermille.flatMap { case (d, p) =>
      Seq.fill(p.toInt)(d.toLong * 100L) // d·100 → first digit d
    }
    val got = graft.engine.Profile.benfordAudit(vals.toDF("v"), col("v"))
      .orderBy("digit").collect()
    assert(got.length === 9)
    got.foreach { r =>
      assert(r.getLong(1) === graft.engine.Profile.BenfordPermille(r.getInt(0) - 1)._2)
      assert(r.getLong(4) === 0L, s"digit ${r.getInt(0)}: exact fit must have chi 0")
    }
  }

  test("audienceOverlap computes exact pairwise Jaccard from bounded pair explode") {
    // users: 1→{x,y}, 2→{x,y}, 3→{x}, 4→{y,z}. |x|=3 |y|=3 |z|=1;
    // x∩y=2 → 1000·2/(3+3-2)=500; y∩z=1 → 1000/(3+1-1)=333; x∩z=0 → absent.
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (4L, "y"), (4L, "z"), (4L, "z")).toDF("u", "c")
    val got = graft.engine.Profile.audienceOverlap(df, col("u"), col("c"))
      .orderBy("cat_a", "cat_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("x", "y", 2L, 500L), ("y", "z", 1L, 333L)))
  }

  // ------------------------------------------------ Welch t² / HHI / autocorr / FD

  test("welchTSquared matches the hand-computed two-sample case and guards n<2") {
    // A = (1,3): mean 2, s²=2. B = (5,9): mean 7, s²=8. t² = 25/(1+4) = 5.
    val df = Seq(("g", "A", 1L), ("g", "A", 3L), ("g", "B", 5L), ("g", "B", 9L),
      ("h", "A", 1L), ("h", "B", 2L), ("h", "B", 4L)).toDF("grp", "lab", "v")
    val got = graft.engine.Profile.welchTSquared(df, "grp", "lab", "v", "A", "B")
      .orderBy("grp").collect()
    assert((got(0).getLong(1), got(0).getLong(2), got(0).getLong(3)) === ((2L, 2L, 5000000L)))
    assert(got(1).isNullAt(3), "single-point side must yield NULL t²")
  }

  test("concentration is 10^6 for a monopoly and 10^6/k for a uniform split") {
    val df = Seq(("mono", 1L), ("mono", 1L), ("mono", 1L),
      ("unif", 1L), ("unif", 2L), ("unif", 3L), ("unif", 4L)).toDF("k", "e")
    val got = graft.engine.Profile.concentration(df, "k", "e")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq === Seq(("mono", 1L, 1000000L), ("unif", 4L, 250000L)))
  }

  test("lagAutocorrelation is +10^6 on a monotone ramp and -10^6 on alternation") {
    // ramp pairs (1,2),(2,3),(3,4) → r=1. alternation (0,1),(1,0),(0,1) → r=-1.
    val df = (Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).map { case (t, v) => ("ramp", t, v) } ++
      Seq((1L, 0L), (2L, 1L), (3L, 0L), (4L, 1L)).map { case (t, v) => ("alt", t, v) })
      .toDF("k", "t", "v")
    val got = graft.ext.TimeSeries.lagAutocorrelation(df, "k", col("t"), col("v"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("alt", 3L, -1000000L), ("ramp", 3L, 1000000L)))
  }

  test("functionalDependency certifies a holding FD and counts violations") {
    val df = Seq((1L, "x"), (1L, "x"), (2L, "y"), (3L, "a"), (3L, "b"), (3L, "c"))
      .toDF("k", "v")
    val r = graft.engine.Expectations.functionalDependency(df, "k_to_v",
      Seq("k"), Seq("v")).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === (("k_to_v", 3L, 1L, 3L)))
  }

  // ------------------------------------------------ BPE encode / quotas / skyline

  test("bpeEncode applies learned merges left-to-right, non-overlapping") {
    // Trainer on "abab abab ab" learns (a,b) twice (Round9Spec). Encoding:
    // 'abab' → ·a·b·a·b· → m1 → ·ab·a·b· → m2 → ·ab·ab· = 2 symbols;
    // 'ab' → 1 symbol. Doc total: 2+2+1 = 5 tokens, 3 words, 10 chars.
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.bpeEncode(docs, "doc_id", col("text"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 5L, 3L, 10L)))
  }

  test("largestRemainderQuotas sums exactly to the budget with top-remainder seats") {
    // counts a:5 b:3 c:2, total 7 → floors 3/2/1, remainders 5/1/4 → a gets
    // the leftover seat: 4/2/1, Σ = 7.
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).toDF("g")
    val got = graft.ext.Sampling.largestRemainderQuotas(df, col("g"), total = 7L)
      .orderBy("group").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)))
  }

  test("largestRemainderQuotas: random splits always sum to the budget") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 500).map(_ => s"s${rnd.nextInt(13)}")
    val got = graft.ext.Sampling.largestRemainderQuotas(rows.toDF("g"), col("g"), 997L)
    assert(got.agg(sum("quota")).head().getLong(0) === 997L)
  }

  test("skyline2D equals the quadratic dominance filter, duplicates surviving") {
    // frontier: (1,5) (2,4) (3,3)×2 — the duplicate pair survives (neither
    // strictly dominates the other); (2,2) is dominated.
    val pts = Seq((1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 3L), (4L, 3L, 3L), (5L, 2L, 2L))
      .toDF("id", "x", "y")
    withTempDir { dir =>
      val got = graft.ext.Rank.skyline2D(pts, "x", "y", dir, numPartitions = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 1L, 5L), (2L, 2L, 4L), (3L, 3L, 3L), (4L, 3L, 3L)))
    }
    // random equivalence vs the quadratic oracle
    val rnd = new scala.util.Random(11)
    val rand = (1 to 300).map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val expected = rand.filterNot { case (_, x, y) =>
      rand.exists { case (_, x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.toSet
    withTempDir { dir =>
      val got = graft.ext.Rank.skyline2D(rand.toDF("id", "x", "y"), "x", "y", dir, 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected)
    }
  }

  // ------------------------------------------------ proration / greedy coverage

  test("prorateOverMonths allocates remainders to the earliest slices, sums exactly") {
    // 100 cents over 3 months from mid-January → 34 / 33 / 33.
    val df = Seq(("2024-01-15", 100L)).toDF("d", "amt")
      .withColumn("d", to_date(col("d")))
    val got = TimeSeries.prorateOverMonths(df, col("amt"), col("d"), periods = 3)
      .orderBy("month").collect()
      .map(r => (r.getDate(0).toString, r.getLong(2)))
    assert(got.toSeq === Seq(("2024-01-01", 34L), ("2024-02-01", 33L), ("2024-03-01", 33L)))
    // random amounts: total recognized equals total input exactly
    val rnd = new scala.util.Random(9)
    val many = (1 to 200).map(i => (s"2024-0${1 + i % 9}-0${1 + i % 27 % 9}", rnd.nextInt(100000).toLong))
      .toDF("d", "amt").withColumn("d", to_date(col("d")))
    val outSum = TimeSeries.prorateOverMonths(many, col("amt"), col("d"), 7)
      .agg(sum("recognized_cents")).head().getLong(0)
    val inSum = many.agg(sum("amt")).head().getLong(0)
    assert(outSum === inSum)
  }

  test("greedyCoverage picks by marginal gain with deterministic ties") {
    // d1 covers 5 shingles; d3 adds 3 fresh; d2 then adds only its 2
    // not-overlapping-with-d1 shingles (abc is shared).
    val docs = Seq((1L, "a b c d e f g"), (2L, "a b c x y"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val got = graft.ext.Sampling.greedyCoverage(docs, rounds = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, 1L, 5L, 5L), (2, 3L, 3L, 8L), (3, 2L, 2L, 10L)))
  }

  // ------------------------------------------------ dynamic partition overwrite

  test("overwritePartitions replaces only the partitions present in the frame") {
    withTempDir { dir =>
      def files(p: String) = Option(new java.io.File(s"$dir/t/p=$p").listFiles())
        .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
      val before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
      graft.engine.Sources.overwritePartitions(
        Seq(("a", 1L), ("b", 2L)).toDF("p", "v"), s"$dir/t", "p")
      val aFiles = files("a")
      graft.engine.Sources.overwritePartitions(
        Seq(("b", 99L)).toDF("p", "v"), s"$dir/t", "p")
      val got = spark.read.parquet(s"$dir/t").collect()
        .map(r => (r.getAs[String]("p"), r.getAs[Long]("v"))).toSet
      assert(got === Set(("a", 1L), ("b", 99L)),
        "partition b replaced, partition a untouched, no duplication")
      assert(files("a") === aFiles, "untouched partition must keep its exact files")
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode") === before)
    }
  }

  // ------------------------------------------------ grouped top-k operator

  test("GroupedTopKExec equals the window form, excludes null values, handles small groups") {
    import graft.plans.{GroupedTopK, GroupedTopKStrategy}
    import org.apache.spark.sql.expressions.Window
    if (!spark.experimental.extraStrategies.exists(_ eq GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val rnd = new scala.util.Random(5)
    // values drawn from a small range → plenty of ties, broken by id; one
    // group smaller than k; some null values that must drop
    val rows = (1 to 400).map { i =>
      val g = s"g${rnd.nextInt(6)}"
      val v: java.lang.Long = if (rnd.nextInt(20) == 0) null else rnd.nextInt(10).toLong
      (g, i.toLong, v)
    } :+ (("tiny", 9999L, java.lang.Long.valueOf(1L)))
    val df = rows.toDF("g", "id", "v").repartition(7)
    val got = GroupedTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val expected = df.filter(col("v").isNotNull)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").desc)))
      .filter(col("rk") <= 5).drop("rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.exists(_._1 == "tiny"), "a group smaller than k keeps all its rows")
  }

  test("GroupedTopK plans partial+final execs around one exchange, no sort, no window") {
    import graft.plans.{GroupedTopK, GroupedTopKStrategy}
    if (!spark.experimental.extraStrategies.exists(_ eq GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val df = Seq(("a", 1L, 10L), ("b", 2L, 20L)).toDF("g", "id", "v").repartition(3)
    val plan = GroupedTopK.topKPerGroup(df, Seq("g"), "v", "id", k = 2)
      .queryExecution.executedPlan.toString
    assert("GroupedTopK".r.findAllIn(plan).size >= 2,
      s"expected partial+final GroupedTopKExec:\n$plan")
    assert(plan.contains("hashpartitioning(g"),
      s"expected a hash exchange on the group key:\n$plan")
    assert(!plan.contains("Sort ") && !plan.contains("Window"),
      s"grouped top-k must not sort or window:\n$plan")
  }

  // ------------------------------------------------ materialized-view rewrite

  test("MV rewrite fires on the exact aggregate, skips others, and stays sound") {
    import graft.plans.MaterializedViews
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    withTempDir { dir =>
      Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v").write.parquet(s"$dir/base")
      def q = spark.read.parquet(s"$dir/base").groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      val expected = q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MaterializedViews.clear()
      MaterializedViews.create(spark, q, s"$dir/mv")
      val rule = MaterializedViews.rewriteRule
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
      try {
        // fires: no Aggregate remains, values identical to direct computation
        assert(q.queryExecution.optimizedPlan.collectFirst {
          case a: Aggregate => a }.isEmpty, "matching aggregate must rewrite away")
        assert(q.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
          === expected)
        // a DIFFERENT aggregate over the same base must NOT rewrite
        val other = spark.read.parquet(s"$dir/base").groupBy(col("k"))
          .agg(max(col("v")).as("m"))
        assert(other.queryExecution.optimizedPlan.collectFirst {
          case a: Aggregate => a }.isDefined, "non-matching aggregate must survive")
        assert(other.collect().map(r => (r.getString(0), r.getLong(1))).toSet
          === Set(("a", 2L), ("b", 5L)))
        // the same aggregate FILTERED must not rewrite either
        val filtered = spark.read.parquet(s"$dir/base").filter(col("v") > 1)
          .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        assert(filtered.queryExecution.optimizedPlan.collectFirst {
          case a: Aggregate => a }.isDefined)
        // re-creating an equivalent definition through the live rule is refused
        val e = intercept[IllegalArgumentException] {
          MaterializedViews.create(spark, q, s"$dir/mv2")
        }
        assert(e.getMessage.contains("already registered"))
      } finally {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations.filterNot(_ eq rule)
        MaterializedViews.clear()
      }
      // with the registry cleared the aggregate plans (and runs) normally again
      assert(q.queryExecution.optimizedPlan.collectFirst {
        case a: Aggregate => a }.isDefined)
    }
  }

  // ------------------------------------------------ quantile normalization

  test("quantileNormalize is the identity when the group is the whole input") {
    val df = (1 to 20).map(i => (i.toLong, "all", (i * 7 % 13).toLong))
      .toDF("id", "grp", "v")
    withTempDir { dir =>
      val got = Rank.quantileNormalize(df, "grp", "v", "id", dir, numPartitions = 4)
        .collect().map(r => (r.getLong(2), r.getLong(3)))
      assert(got.length === 20 && got.forall { case (v, nv) => v === nv })
    }
  }

  // ------------------------------------------------ footer-only aggregates

  test("pushedAggregates answers from footers, matches the data, restores confs") {
    withTempDir { dir =>
      Seq((1L, 2.5), (9L, -1.5), (4L, 7.0)).toDF("k", "v")
        .write.parquet(s"$dir/t")
      val before = spark.conf.get("spark.sql.sources.useV1SourceList")
      val got = graft.engine.Skipping.pushedAggregates(spark, s"$dir/t", Seq("k", "v"))
        .collect().head
      assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((3L, 1L, 9L)))
      assert((got.getDouble(3), got.getDouble(4)) === ((-1.5, 7.0)))
      assert(spark.conf.get("spark.sql.sources.useV1SourceList") === before)
      assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") === "false")
    }
  }

  // ------------------------------------------------ activity streaks

  test("activityStreaks splits on gap days and counts each day once") {
    // u1 active days 1,2,3,5,6,9 (day 2 twice — must dedupe): islands of
    // length 3, 2, 1. u2: one day.
    def ts(day: Int, h: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val df = Seq((1L, ts(1, 5)), (1L, ts(2, 5)), (1L, ts(2, 20)), (1L, ts(3, 5)),
      (1L, ts(5, 5)), (1L, ts(6, 5)), (1L, ts(9, 5)), (2L, ts(4, 1)))
      .toDF("u", "ts")
    val got = TimeSeries.activityStreaks(df, "u", "ts")
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 6L, 3L, 3L), (2L, 1L, 1L, 1L)))
  }

  // ------------------------------------------------ grouped OLS

  test("groupedOls recovers an exact line and truncates a fractional fit") {
    // g1: y = 2x + 3 exactly. g2: (0,0),(1,1),(2,1) → slope 1/2, intercept 1/6.
    val df = ((1 to 5).map(x => ("g1", x.toLong, 2L * x + 3)) ++
      Seq(("g2", 0L, 0L), ("g2", 1L, 1L), ("g2", 2L, 1L))).toDF("g", "x", "y")
    val got = graft.engine.Profile.groupedOls(df, "g", "x", "y")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("g1", 5L, 2000000L, 3000000L),
      ("g2", 3L, 500000L, 166666L)))
  }

  test("groupedOls2 recovers an exact plane and NULLs a singular moment matrix") {
    // plane y = 1 + 2·x1 + 3·x2 over a non-degenerate design
    val plane = for (x1 <- 0L to 3L; x2 <- 0L to 3L)
      yield ("p", x1, x2, 1L + 2L * x1 + 3L * x2)
    // collinear group: x2 = 2·x1 → singular
    val sing = Seq(("s", 1L, 2L, 5L), ("s", 2L, 4L, 7L), ("s", 3L, 6L, 9L))
    val got = graft.engine.Profile.groupedOls2(
        (plane ++ sing).toDF("g", "x1", "x2", "y"), "g", "x1", "x2", "y")
      .orderBy("g").collect()
    assert((got(0).getLong(2), got(0).getLong(3), got(0).getLong(4))
      === ((1000000L, 2000000L, 3000000L)))
    assert(got(1).isNullAt(2) && got(1).isNullAt(3) && got(1).isNullAt(4))
  }

  test("groupedOls emits NULL coefficients when x has zero variance") {
    val df = Seq(("c", 4L, 1L), ("c", 4L, 9L), ("s", 1L, 1L)).toDF("g", "x", "y")
    val got = graft.engine.Profile.groupedOls(df, "g", "x", "y")
      .orderBy("g").collect()
    assert(got.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("quantileNormalize maps both groups onto the same global quantiles") {
    // X=[1,2,3], Y=[10,20,30]; global sorted (1,2,3,10,20,30). Rank r of 3
    // maps to global rank 2r: both groups normalize to {2, 10, 30}.
    val df = Seq((1L, "x", 1L), (2L, "x", 2L), (3L, "x", 3L),
      (4L, "y", 10L), (5L, "y", 20L), (6L, "y", 30L)).toDF("id", "grp", "v")
    withTempDir { dir =>
      val got = Rank.quantileNormalize(df, "grp", "v", "id", dir, numPartitions = 3)
        .orderBy("id").collect().map(r => r.getLong(3))
      assert(got.toSeq === Seq(2L, 10L, 30L, 2L, 10L, 30L))
    }
  }
}
