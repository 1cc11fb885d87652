package graft

import org.apache.spark.sql.functions._

import graft.ext.Spatial

/** Round-10c additions: the grid-bucketed spatial join's completeness and
  * exactness against a naive quadratic reference, on adversarial
  * cell-boundary layouts the hash-placed q238 data can't guarantee to hit. */
class Round10cSpec extends SparkSpec {
  import spark.implicits._

  private def naivePairs(
      pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= r * r
    } yield (ia, ib, d2)).toSet

  private def gridPairs(
      pts: Seq[(Long, Long, Long)], r: Long): Set[(Long, Long, Long)] =
    Spatial.withinRadiusPairs(pts.toDF("id", "x", "y"), r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet

  test("withinRadiusPairs: exact-boundary pairs across cell edges survive bucketing") {
    val r = 10L
    // pairs at EXACTLY distance r in every straddling configuration: axis-
    // aligned across a cell edge, diagonal 6-8-10 triple across a corner,
    // coincident points, and a pair one unit beyond r that must NOT appear
    val pts = Seq(
      (1L, 9L, 5L), (2L, 19L, 5L),   // dx = r exactly, cells 0 and 1
      (3L, 28L, 9L), (4L, 34L, 17L), // 6-8-10 diagonal straddling a corner
      (5L, 50L, 50L), (6L, 50L, 50L),// coincident — d2 = 0
      (7L, 70L, 5L), (8L, 81L, 5L))  // dx = r+1 — excluded
    val got = gridPairs(pts, r)
    assert(got === naivePairs(pts, r))
    assert(got.contains((1L, 2L, 100L)) && got.contains((3L, 4L, 100L))
      && got.contains((5L, 6L, 0L)))
    assert(!got.exists(p => p._1 == 7L && p._2 == 8L))
  }

  test("withinRadiusPairs ≡ naive quadratic on a deterministic point sweep") {
    // affine low-discrepancy placement: clusters + spread, many cell edges
    val pts = (0L until 300L).map { i =>
      (i, (i * 7919L + 13L) % 400L, (i * 104729L + 7L) % 400L)
    }
    for (r <- Seq(1L, 17L, 50L, 400L))
      assert(gridPairs(pts, r) === naivePairs(pts, r), s"radius $r diverged")
  }

  test("kaplanMeier: hand-computed product-limit curve with censoring and ties") {
    // 6 subjects: events at d=1,2,4,5; censored at d=3 and (tied with a
    // death) d=4 — checks the flat censor step, the tie, and the drop to 0
    val durs = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 1), (4L, 0), (5L, 1))
      .toDF("d", "ev")
    val got = graft.ext.Survival.kaplanMeier(durs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 6L, 1L, 0L, 833333333L), // ⌊1e9·5/6⌋
      (2L, 5L, 1L, 0L, 666666666L), // ⌊833333333·4/5⌋
      (3L, 4L, 0L, 1L, 666666666L), // censor-only: curve flat
      (4L, 3L, 1L, 1L, 444444444L), // ⌊666666666·2/3⌋
      (5L, 1L, 1L, 0L, 0L)))        // last subject dies: S = 0
  }

  test("rrFrequencies: exact debias numerators, zero-report categories, sum identity") {
    import graft.ext.Privacy
    val cats = Seq("a", "b", "c")
    // known report counts: a=5, b=1, c absent (but must still be debiased)
    val reports = (Seq.fill(5)("a") ++ Seq("b")).toDF("reported")
    val got = Privacy.rrFrequencies(reports, "reported", cats, 700)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // est_num = 1000·obs·k − (1000−keep)·n with k=3, n=6, keep=700
    assert(got.toSeq === Seq(
      ("a", 5L, 1000L * 5 * 3 - 300L * 6),
      ("b", 1L, 1000L * 1 * 3 - 300L * 6),
      ("c", 0L, -300L * 6)))
    // Σ est_num = keep·k·n — the debiased totals always re-sum to n
    assert(got.map(_._3).sum === 700L * 3 * 6)
  }

  test("rrReport: deterministic, closed over the category list, and keeps ~p of labels") {
    import graft.ext.Privacy
    val cats = Seq("x", "y", "z")
    val df = (0L until 600L).map(i => (i, if (i % 2 == 0) "x" else "y")).toDF("id", "v")
    def run() = df.select(col("v"),
        Privacy.rrReport(col("id"), col("v"), cats, 700, "t-salt").as("r"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val a = run(); val b = run()
    assert(a.toSeq === b.toSeq, "hash coins must be replayable")
    assert(a.forall(p => cats.contains(p._2)), "reports must stay in the category list")
    // with keep=0.7 plus 1/3 of the uniform picks, ~80% of reports match
    // the true label; 600 draws put the count far from both 600 and 0.7·600
    val kept = a.count(p => p._1 == p._2)
    assert(kept > 440 && kept < 560, s"kept=$kept outside the plausible band")
    intercept[IllegalArgumentException] {
      Privacy.rrReport(col("id"), col("v"), Seq("z", "a"), 700, "s")
    }
  }

  test("frequentTriples: hand case with in-basket duplicates; ladder ≡ naive on a sweep") {
    import graft.ext.Itemsets
    val hand = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L), // dup 10 collapses
      (2L, 10L), (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 20L),
      (4L, 30L), (4L, 40L)).toDF("b", "i")
    val got = Itemsets.frequentTriples(hand, "b", "i", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((10L, 20L, 30L, 2L)))
    // deterministic basket sweep vs a naive in-memory count
    val baskets = for { b <- 0L until 60L; j <- 0L until (b % 5 + 2) }
      yield (b, (b * 3 + j * 7) % 11)
    val naive = baskets.distinct.groupBy(_._1).values
      .flatMap(items => items.map(_._2).sorted.combinations(3))
      .toSeq.groupBy(identity).map { case (t, xs) => (t(0), t(1), t(2), xs.size.toLong) }
      .filter(_._4 >= 2L).toSet
    val ladder = Itemsets.frequentTriples(baskets.toDF("b", "i"), "b", "i", 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(ladder === naive)
  }

  test("blowup guards: oversized baskets are dropped; unbucketed scores throw loudly") {
    import graft.ext.{Calibration, Itemsets}
    // one well-formed triple basket plus a 6-item hub basket: with
    // maxBasketSize=5 the hub contributes NOTHING, so (10,20,30) keeps
    // support 2 (not 3) and no hub-only triple appears
    val hub = (1L to 6L).map(i => (99L, i * 10L))
    val bs = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L)) ++ hub
    val got = Itemsets.frequentTriples(bs.toDF("b", "i"), "b", "i", 2L, maxBasketSize = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((10L, 20L, 30L, 2L)))
    // a raw "continuous" score (all-distinct buckets) must throw, not cube
    val continuous = (1L to 50L).map(i => (i, (i % 2).toInt)).toDF("bucket", "label")
    val e = intercept[IllegalArgumentException] {
      Calibration.isotonicFit(continuous, "bucket", "label", maxBuckets = 20L)
    }
    assert(e.getMessage.contains("BUCKETED"))
  }

  test("boundedShortestPaths: late-round improvements re-relax downstream; early exit is lossless") {
    import graft.ext.Graph
    // 1→3 direct costs 10, but 1→2→3 costs 2 and is only found in round 2;
    // node 4 hangs off 3, so its best distance NEEDS the round-2 improvement
    // to re-enter the frontier and propagate in round 3. Node 9 is isolated.
    val edges = Seq(
      (1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 5L), (9L, 9L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    def run(rounds: Int) = Graph.boundedShortestPaths(edges, seeds, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(run(1) === Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    assert(run(2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 15L))
    assert(run(3) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 7L))
    // converged: extra rounds exit early with the same answer; 9 unreachable
    assert(run(10) === run(3))
  }

  test("rollingOriginBacktest: hand-computed naive/seasonal errors; short series yields 0/NULL") {
    import graft.ext.TimeSeries
    val series = ((1 to 9).map(t => ("a", t, t * 10L)) :+ (("b", 1, 5L)))
      .toDF("k", "t", "v")
    val got = TimeSeries.rollingOriginBacktest(series, "k", "t", "v", 7)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    // naive: 8 one-step errors of +10; seasonal(7): t=8,9 err +70 each
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((8L, 80L, 80L)))
    assert((a.getLong(4), a.getLong(5), a.getLong(6)) === ((2L, 140L, 140L)))
    val b = got("b")
    assert(b.getLong(1) === 0L && b.isNullAt(2) && b.isNullAt(3),
      "a 1-point series has no scorable forecasts")
  }

  /** Exact PAVA with rational pools, for certifying the minimax form:
    * returns ⌊1e6·fit⌋ per bucket. */
  private def pavaMicros(buckets: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    // stack of (bs, w, pos) blocks; merge while the tail violates monotonicity
    val st = scala.collection.mutable.ArrayBuffer[(List[Long], Long, Long)]()
    buckets.sortBy(_._1).foreach { case (b, w, pos) =>
      st += ((List(b), w, pos))
      // rate(a) >= rate(b)  ⇔  posA·wB >= posB·wA (cross-multiplied, exact)
      while (st.length >= 2 &&
        st(st.length - 2)._3 * st.last._2 >= st.last._3 * st(st.length - 2)._2) {
        val t = st.remove(st.length - 1); val s2 = st.remove(st.length - 1)
        st += ((s2._1 ++ t._1, s2._2 + t._2, s2._3 + t._3))
      }
    }
    st.flatMap { case (bs, w, pos) => bs.map(_ -> pos * 1000000L / w) }.toMap
  }

  test("isotonicFit: hand pooling case and ≡ exact PAVA on sweeps; fit is monotone") {
    import graft.ext.Calibration
    def fit(buckets: Seq[(Long, Long, Long)]): Map[Long, Long] = {
      val rows = buckets.flatMap { case (b, w, pos) =>
        Seq.fill(pos.toInt)((b, 1)) ++ Seq.fill((w - pos).toInt)((b, 0))
      }
      Calibration.isotonicFit(rows.toDF("bucket", "label"), "bucket", "label")
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    }
    // rates [1.0, 0.0, 1.0] must pool the first two to 0.5
    val hand = Seq((1L, 2L, 2L), (2L, 2L, 0L), (3L, 1L, 1L))
    assert(fit(hand) === Map(1L -> 500000L, 2L -> 500000L, 3L -> 1000000L))
    // pseudo-random sweeps vs the exact rational PAVA
    for (seed <- Seq(3L, 11L)) {
      val bks = (0L until 12L).map { b =>
        val w = (b * seed * 7 % 5) + 1
        (b, w, (b * seed * 13 % (w + 1)))
      }
      val got = fit(bks)
      assert(got === pavaMicros(bks), s"seed $seed diverged from exact PAVA")
      val inOrder = bks.map(_._1).sorted.map(got)
      assert(inOrder === inOrder.sorted, "isotonic fit must be non-decreasing")
    }
  }

  test("associationRules: confidence is directional, lift must be strictly > 1") {
    import graft.ext.Itemsets
    // A(1) in 8 of 10 baskets, B(2) in the 2 where A also is: B→A has 100%
    // confidence and lift 1.25; A→B only 25% and is cut by minconf=500‰.
    // C(3) in 5, D(4) in 4 with 2 overlaps: lift exactly 1 → excluded.
    val baskets =
      (1L to 8L).map(b => (b, 1L)) ++ Seq((1L, 2L), (2L, 2L)) ++
        (1L to 5L).map(b => (b, 3L)) ++ Seq((4L, 4L), (5L, 4L), (9L, 4L), (10L, 4L))
    val got = Itemsets.associationRules(baskets.toDF("b", "i"), "b", "i", 2L, 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got === Set(
      (2L, 1L, 2L, 8L, 2L, 10L),  // B→A: conf 100%, lift 1.25
      (1L, 3L, 8L, 5L, 5L, 10L),  // A→C: conf 62.5%, lift 1.25
      (3L, 1L, 5L, 8L, 5L, 10L),  // C→A: conf 100%, lift 1.25
      (2L, 3L, 2L, 5L, 2L, 10L))) // B→C: conf 100%, lift 2
    // cut: A→B (25% < 500‰), C→B (40%), C↔D (lift exactly 1, strict >)
    assert(!got.exists(r => r._1 == 4L || r._2 == 4L))
  }

  test("partition-spec evolution: exact at the cutover seam, range edges, and spec boundaries") {
    import graft.engine.Layout
    // one row per day around the cutover (inclusive edges matter)
    val days = Seq("1997-12-30", "1997-12-31", "1998-01-01", "1998-01-02",
      "1998-06-30", "1999-01-01")
    val df = days.zipWithIndex
      .map { case (d, i) => (i.toLong, java.sql.Date.valueOf(d)) }
      .toDF("id", "dt")
    withTempDir { root =>
      Layout.writeDateSpecEvolution(df, col("dt"), "1998-01-01", root)
      def ids(from: String, to: String): Set[Long] =
        Layout.readDateSpecEvolution(spark, root, from, to)
          .select("id").collect().map(_.getLong(0)).toSet
      // cutover day itself must come from the YEAR spec, exactly once
      assert(ids("1998-01-01", "1998-01-01") === Set(2L))
      // straddling range: no loss, no duplication at the seam
      assert(ids("1997-12-31", "1998-01-02") === Set(1L, 2L, 3L))
      // month-spec-only and year-spec-only ranges
      assert(ids("1997-01-01", "1997-12-31") === Set(0L, 1L))
      assert(ids("1998-01-02", "1999-12-31") === Set(3L, 4L, 5L))
      // physical layout really evolved: month= dirs before, year= after
      assert(new java.io.File(s"$root/spec=month/month=1997-12").isDirectory)
      assert(new java.io.File(s"$root/spec=year/year=1998").isDirectory)
      assert(!new java.io.File(s"$root/spec=month/month=1998-01").exists)
    }
  }

  test("negativeSample: negatives avoid ALL of a user's positives, stay in-catalog, replay exactly") {
    import graft.ext.Sampling
    val items = (1L to 40L).toDF("item")
    // user 1 owns most of the catalog — collisions are likely, so the
    // anti join must drop them; user 2 owns two items
    val pos = ((1L to 30L).map(i => (1L, i)) ++ Seq((2L, 5L), (2L, 6L)))
      .toDF("u", "i")
    def run() = Sampling.negativeSample(pos, "u", "i", items, "item", 3, 8, "t1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val a = run()
    assert(a.toSeq === run().toSeq, "hash draws must replay bit-identically")
    val posSet = pos.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a.forall { case (u, _, _, n) => !posSet.contains((u, n)) },
      "a negative must never be one of the user's positives")
    assert(a.forall { case (_, _, _, n) => n >= 1L && n <= 40L },
      "negatives must come from the catalog")
    // each (u,i) yields at most k draws, and survivors exist for both users
    val perPair = a.groupBy(t => (t._1, t._2)).view.mapValues(_.length)
    assert(perPair.values.forall(_ <= 3))
    assert(a.exists(_._1 == 1L) && a.exists(_._1 == 2L))
    // a different salt re-randomizes the draws
    val b = Sampling.negativeSample(pos, "u", "i", items, "item", 3, 8, "t2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(b.toSeq !== a.toSeq)
  }

  test("tableFingerprint: order-blind, edit-sensitive, even-dup-sensitive, boundary-safe") {
    import graft.engine.Profile
    def fp(rows: Seq[(Long, String)]): (Long, Long, java.math.BigDecimal) = {
      val d = rows.toDF("k", "v")
      val r = Profile.tableFingerprint(d, Seq(d("k"), d("v"))).head()
      (r.getLong(0), r.getLong(1), r.getDecimal(2))
    }
    val base = Seq((1L, "ab"), (2L, "c"), (3L, "d"))
    assert(fp(base) === fp(base.reverse), "row order must not matter")
    assert(fp(base) !== fp(Seq((1L, "ab"), (2L, "c"), (3L, "e"))),
      "a single edited cell must change the certificate")
    // duplicating a row TWICE leaves xor unchanged — sum and count must catch it
    val dup2 = base ++ Seq(base.head, base.head)
    val (n1, x1, s1) = fp(base); val (n2, x2, s2) = fp(dup2)
    assert((x1 == x2) && (n1 != n2) && (s1 != s2),
      "even-parity duplication is exactly the class xor alone misses")
    // the 0x01 separator keeps ('ab','c') distinct from ('a','bc')
    val d1 = Seq(("ab", "c")).toDF("a", "b"); val d2 = Seq(("a", "bc")).toDF("a", "b")
    assert(Profile.tableFingerprint(d1, Seq(d1("a"), d1("b"))).head().getLong(1)
      !== Profile.tableFingerprint(d2, Seq(d2("a"), d2("b"))).head().getLong(1),
      "column-boundary shifts must not collide")
  }

  test("overlapSpans: a planted verbatim passage is found with its exact run length") {
    import graft.ext.Dedup
    val passage = (1 to 12).map(i => s"tok$i").mkString(" ") // 12 shared words
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon"),
      (2L, s"zeta eta $passage theta iota kappa lam"),
      (3L, "unrelated words only here nothing shared with others at all"))
      .toDF("doc_id", "text")
    // anchorMod=1: every shingle seeds, so detection is exact (the sparse-
    // anchor recall dial is exercised by q248 at corpus scale)
    val got = Dedup.overlapSpans(docs, "doc_id", "text", anchorMod = 1, dfCap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    // 12 shared words = 10 consecutive 3-grams; run of 10 grams spans 12 words
    assert(got.toSeq === Seq((1L, 2L, 10L, 12L)))
  }

  test("linearAttribution: per-user permille conserves exactly via largest remainder") {
    import graft.ext.Sessionize
    // user u1 touches 3 channels before converting: 1000 = 334+333+333,
    // the extra permille goes to the FIRST touch; u2 touches 1 channel
    val ev = Seq(
      ("u1", 10L, "c_view"), ("u1", 20L, "a_click"), ("u1", 30L, "b_mail"),
      ("u1", 40L, "buy"),
      ("u2", 5L, "a_click"), ("u2", 9L, "buy"),
      ("u3", 7L, "c_view")) // no conversion — contributes nothing
      .toDF("user_id", "ts", "channel")
    val got = Sessionize.linearAttribution(ev, col("user_id"), col("ts"),
        col("channel"), col("channel") === "buy")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      ("c_view", 1L, 334L),  // u1's first touch gets the remainder
      ("a_click", 2L, 333L + 1000L), // u1 (333) + u2 (all 1000)
      ("b_mail", 1L, 333L)))
    assert(got.toSeq.map(_._3).sum === 2000L, "Σcredit = 1000 per converting user")
  }

  test("globalMinTieRanks ≡ RANK() under heavy ties; perfect correlation closes the Spearman identity") {
    import graft.ext.Rank
    // values with big tie groups: v = id % 4
    val rows = (1L to 40L).map(i => (i, i % 4)).toDF("id", "v")
    withTempDir { tmp =>
      val got = Rank.globalMinTieRanks(rows, "v", "id", tmp, numPartitions = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val vals = (1L to 40L).map(i => (i, i % 4))
      val expected = vals.map { case (id, v) =>
        (id, vals.count(_._2 < v).toLong + 1L) }.toMap // RANK(): 1 + #strictly-smaller
      assert(got === expected)
    }
    // rx == ry for a strictly increasing pair series → the ρ=1 identity:
    // n·Σrxy − Σrx·Σry == n·Σrxx − (Σrx)²
    val pairs = (1L to 25L).map(i => (i, i * 3, i * 7)).toDF("id", "x", "y")
    withTempDir { tmp =>
      val r = graft.ext.Rank.spearmanStats(pairs, "x", "y", "id", tmp).head()
      val (n, srx, sry) = (BigDecimal(r.getLong(0)),
        BigDecimal(r.getDecimal(1)), BigDecimal(r.getDecimal(2)))
      val (srxx, sryy, srxy) = (BigDecimal(r.getDecimal(3)),
        BigDecimal(r.getDecimal(4)), BigDecimal(r.getDecimal(5)))
      assert(srx == sry && srxx == sryy)
      assert(n * srxy - srx * sry == n * srxx - srx * srx)
    }
  }

  test("kCore: cascading prune rounds, round-bounded partial result, early exit") {
    import graft.ext.Graph
    def run(edges: Seq[(Long, Long)], k: Long, rounds: Int): Map[Long, Long] =
      Graph.kCore(edges.toDF("id_a", "id_b"), k, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // triangle + tail: k=2 kills the tail, the triangle survives at deg 2
    val triTail = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    assert(run(triTail, 2L, 10) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // a path dissolves COMPLETELY under k=2, but only via endpoint cascade —
    // one round per layer, so the 5-node path needs 2 rounds to empty
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, 2L, 10) === Map.empty)
    // round-bounded: ONE round only removes the endpoints' edges
    assert(run(path, 2L, 1) === Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
    // k=3 on the triangle: every vertex has deg 2 < 3 — gone in one round
    assert(run(triTail, 3L, 10) === Map.empty)
  }

  test("mergeSessionState: exact-gap bridges, chained three-batch spans, fold ≡ one-shot") {
    import graft.ext.Sessionize
    val gap = 10L // seconds
    // user a: one session spanning ALL THREE batches (chained merges);
    // user b: batch-2 event exactly gap after batch-1 (boundary merges),
    //         then one gap+1 later (must NOT merge);
    // user c: batch-1 only
    val ev = Seq(
      ("a", 0L), ("a", 5L), ("a", 12L), ("a", 20L), ("a", 28L),
      ("b", 0L), ("b", 10L), ("b", 21L),
      ("c", 3L)).map { case (u, sec) => (u, sec * 1000000L) }
      .toDF("user_id", "us")
    def sess(d: org.apache.spark.sql.DataFrame) = Sessionize.sessionSummaries(
        d, col("user_id"), col("us"), gap, Seq(col("us")))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"))
    val cuts = Seq(8L * 1000000L, 15L * 1000000L)
    val batches = Seq(
      ev.where(col("us") <= cuts(0)),
      ev.where(col("us") > cuts(0) && col("us") <= cuts(1)),
      ev.where(col("us") > cuts(1)))
    val folded = batches.tail.foldLeft(sess(batches.head)) { (st, b) =>
      Sessionize.mergeSessionState(st, sess(b), gap)
    }
    def key(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(folded) === key(sess(ev)), "fold must equal one-shot sessionization")
    // and the one-shot truth itself: a spans 0-28 in one session; b splits
    val oneShot = key(sess(ev))
    assert(oneShot.contains(("a", 0L, 28000000L, 5L)))
    assert(oneShot.contains(("b", 0L, 10000000L, 2L))
      && oneShot.contains(("b", 21000000L, 21000000L, 1L)))
  }
}
