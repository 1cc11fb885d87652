package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Labels, Sampling, TimeSeries}

/** Round-10 regression guards for the round-9 advice items: LSH index
  * probe correctness under non-monotone batch ids, Fleiss' kappa in
  * decimal (no int64 wrap, single-label NULL), exact proration of
  * negative amounts, and greedyCoverage cache hygiene.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------- LSH index, non-monotone ids

  test("lshIndexProbeAppend emits a pair whose NEW member has the smaller id") {
    // Base corpus uses LARGE ids; the delta batch introduces a near-dup with
    // a SMALLER id. Under the old `a.id < b.id` probe this pair was silently
    // unreachable by any batch; the (batch, id) ordering must emit it once,
    // normalized smallest-id-first.
    val base = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog tonight"),
      (1001L, "completely unrelated text about distributed query engines"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (5L, "quick brown fox jumps over the lazy dog tonight"), // near-dup of 1000, id BELOW it
      (6L, "another unrelated string with no overlap at all zzz"))
      .toDF("doc_id", "text")
    withTempDir { dir =>
      Dedup.lshIndexBuild(base, s"$dir/idx")
      val p1 = Dedup.lshIndexProbeAppend(spark, s"$dir/idx", delta, 1, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(p1 === Set((5L, 1000L)),
        "pair with new-member-smaller-id must be emitted, normalized (least, greatest)")
      // and it must NOT re-emit when a later unrelated batch lands
      val d2 = Seq((9000L, "yet more text sharing nothing with anything here qqq"))
        .toDF("doc_id", "text")
      val p2 = Dedup.lshIndexProbeAppend(spark, s"$dir/idx", d2, 2, threshold = 0.5)
        .collect()
      assert(p2.isEmpty, "previously-completed pairs must not re-emit")
    }
  }

  // ---------------------------------------- Fleiss' kappa in decimal

  test("fleissKappa survives rating volumes that overflowed the int64 path") {
    // N·n = 4.2e6 ratings: c = Σc_j² ≈ (N·n)² ≈ 1.7e13, so the old
    // 1000000*c term needed ~1.7e19 > Long.MaxValue and wrapped silently.
    val n = 3L // raters per item
    val items = 1400000L
    val df = spark.range(items * n)
      .select((col("id") / n).cast("long").as("item"),
        when(pmod(col("id"), lit(64)) === 0, lit("B")).otherwise(lit("A")).as("label"))
    val r = Labels.fleissKappa(df, col("item"), col("label")).collect().head
    val (po, pe, kappa) = (r.getLong(3), r.getLong(4), r.getLong(5))
    // exact BigInt replay of the same integer formulas: each item's 3 ids
    // are consecutive, so it has at most one B vote (one multiple of 64)
    val ratings = BigInt(items * n)
    val bVotes = BigInt((items * n + 63) / 64) // multiples of 64 in [0, items·n)
    val itemsWithB = bVotes                    // distinct items (≤1 B each)
    val a = (BigInt(items) - itemsWithB) * 6 + itemsWithB * 2
    val b = BigInt(items) * n * (n - 1)
    val c = (ratings - bVotes) * (ratings - bVotes) + bVotes * bVotes
    val d = ratings * ratings
    assert(BigInt(po) === BigInt(1000000) * a / b)
    assert(BigInt(pe) === BigInt(1000000) * c / d)
    assert(BigInt(kappa) ===
      BigInt(1000000) * (a * items * n - c * (n - 1)) / ((n - 1) * (d - c)))
    assert(kappa >= -1000000L && kappa <= 1000000L, s"kappa_micro wrapped: $kappa")
  }

  test("fleissKappa returns NULL kappa on single-label input instead of div/0") {
    val df = Seq((1, "A"), (1, "A"), (2, "A"), (2, "A")).toDF("item", "label")
    val r = Labels.fleissKappa(df, col("item"), col("label")).collect().head
    assert(r.getLong(3) === 1000000L) // perfect observed agreement
    assert(r.isNullAt(5), "kappa must be NULL when expected-disagreement mass is zero")
  }

  // ---------------------------------------- negative-amount proration

  test("prorateOverMonths is exact for negative and positive amounts") {
    val df = Seq(
      (-5L, "2026-01-15"), (5L, "2026-01-20"), (-100L, "2026-02-01"),
      (0L, "2026-01-01"), (7L, "2026-03-05"))
      .toDF("amt", "d").withColumn("d", to_date(col("d")))
    val out = TimeSeries.prorateOverMonths(df, col("amt"), col("d"), periods = 3)
    val total = out.agg(sum("recognized_cents")).head().getLong(0)
    assert(total === (-5L + 5L - 100L + 0L + 7L), "Σ slices must equal Σ amounts exactly")
    // -5 over 3 months: floor(-5/3)=-2, pmod(-5,3)=1 → slices -1,-2,-2
    // (the truncating path gave -1,-1,-1 = -3, leaking 2 cents)
    val neg = TimeSeries.prorateOverMonths(
        Seq((-5L, "2026-01-15")).toDF("amt", "d").withColumn("d", to_date(col("d"))),
        col("amt"), col("d"), periods = 3)
      .orderBy("month").select("recognized_cents").as[Long].collect().toSeq
    assert(neg === Seq(-1L, -2L, -2L))
  }

  // ---------------------------------------- chi-square independence

  test("chiSquareIndependence matches the hand-computed 2x2 example") {
    // O = [[10, 20], [20, 10]]: N=60, margins 30/30 each.
    // E = 15 everywhere; chi2 = 4 * (5^2/15) = 20/3 = 6.6666... -> per-cell
    // term ⌊10^6·(60·O − 900)²/(60·30·30)⌋ = ⌊(300·10^6)²·.../54000·10^6⌋:
    // each cell: (60·10−900)² = 90000, ·10^6 / 54000·... compute: 10^6·90000²?
    // term = (10^6·(N·O−RC)²) DIV (N·R·C) = 10^6·90000^2... no: N·O−R·C =
    // 600−900 = −300 → (−300)²=90000 → 10^6·90000 DIV 54000 = 1666666 per
    // cell → ×4 = 6666664 micro (truncation loses 2/3 micro per cell).
    val df = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val out = graft.engine.Profile.chiSquareIndependence(df, col("r"), col("c"))
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ===
      ((2L, 2L, 60L, 1L)))
    assert(out.getLong(4) === 6666664L)
  }

  test("chiSquareIndependence counts absent grid cells' expected mass") {
    // r=b never co-occurs with c=y: the (b,y) cell must still contribute.
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x"))).toDF("r", "c")
    val out = graft.engine.Profile.chiSquareIndependence(df, col("r"), col("c"))
      .collect().head
    // N=15, margins: Ra=10, Rb=5, Cx=10, Cy=5. E(b,y)=5·5/15=5/3.
    // chi2 = 15·(5·0-... replay: Σ ⌊10^6·(15·O−RC)²/(15·R·C)⌋ over 4 cells:
    // (a,x): (75−100)²·10^6/(15·10·10)=625·10^6/1500=416666
    // (a,y): (75−50)²·10^6/(15·10·5)=625·10^6/750=833333
    // (b,x): (75−50)²·10^6/(15·5·10)=833333
    // (b,y): (0−25)²·10^6/(15·5·5)=625·10^6/375=1666666
    assert(out.getLong(4) === (416666L + 833333L + 833333L + 1666666L))
  }

  // ---------------------------------------- shallow clone

  test("shallowClone is zero-copy, and source/clone evolve independently") {
    import graft.engine.Incremental
    val base = Seq((1L, "A", 100L), (2L, "B", 200L), (3L, "A", 300L))
      .toDF("id", "seg", "cents")
    withTempDir { dir =>
      Incremental.commitVersion(base.coalesce(1), s"$dir/src", 0L)
      val nRefs = Incremental.shallowCloneVersion(spark, s"$dir/src", 0L, s"$dir/clone")
      assert(nRefs >= 1)
      // zero-copy: the clone dir holds NO parquet of its own at v=0
      val cloneV0 = new java.io.File(s"$dir/clone/v=0").listFiles().map(_.getName)
      assert(!cloneV0.exists(_.startsWith("part-")), "clone v=0 must hold refs, not data")
      // read-through equals source
      assert(Incremental.readShallowClone(spark, s"$dir/clone")
        .orderBy("id").collect().map(_.getLong(2)).toSeq === Seq(100L, 200L, 300L))
      // clone evolves; source must not observe it
      val upd = Seq((2L, "B", 999L)).toDF("id", "seg", "cents")
      Incremental.commitVersion(
        graft.engine.Merge.upsert(Incremental.readShallowClone(spark, s"$dir/clone"),
          upd, Seq("id")).drop("merge_action").coalesce(1), s"$dir/clone", 1L)
      assert(Incremental.readShallowClone(spark, s"$dir/clone")
        .filter(col("id") === 2).head().getLong(2) === 999L)
      assert(Incremental.latestUpsertStateBefore(spark, s"$dir/src", Long.MaxValue).get
        .filter(col("id") === 2).head().getLong(2) === 200L,
        "source must not observe clone commits")
      // vacuum contract: the clone pins exactly the referenced source files
      val pinned = Incremental.cloneReferencedFiles(spark, s"$dir/clone")
      assert(pinned.size === nRefs && pinned.forall(_.contains("/src/v=0/")))
    }
  }

  // ---------------------------------------- linear interpolation

  test("linearInterpolateDaily fills holes with exact integer slopes") {
    val df = Seq((1L, "2026-01-01", 100L), (1L, "2026-01-04", 160L),
      (1L, "2026-01-05", 10L), (2L, "2026-03-01", 7L))
      .toDF("k", "d", "y").withColumn("d", to_date(col("d")))
    val out = graft.ext.TimeSeries.linearInterpolateDaily(df, "k", col("d"), col("y"))
      .orderBy("k", "day")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(
      (1L, "2026-01-01", 100L, false),
      (1L, "2026-01-02", 120L, true),  // 100 + 60*1/3
      (1L, "2026-01-03", 140L, true),  // 100 + 60*2/3
      (1L, "2026-01-04", 160L, false),
      (1L, "2026-01-05", 10L, false),  // observed beats interpolation
      (2L, "2026-03-01", 7L, false)))  // singleton key: one observed row
  }

  // ---------------------------------------- recall audit

  test("recallAudit counts hits/misses and survives an empty truth set") {
    val truth = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val found = Seq((1L, 2L), (4L, 5L), (9L, 10L)).toDF("id_a", "id_b")
    val r = graft.ext.Dedup.recallAudit(truth, found, Seq("id_a", "id_b")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((3L, 3L, 2L, 1L, 666L)))
    val empty = graft.ext.Dedup.recallAudit(
      truth.filter(col("id_a") < 0), found, Seq("id_a", "id_b")).collect().head
    assert(empty.getLong(0) === 0L && empty.isNullAt(4))
  }

  // ---------------------------------------- greedyCoverage cache hygiene

  test("greedyCoverage leaves no cached RDDs behind") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta"),
      (3L, "omega psi chi phi upsilon tau sigma rho"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Sampling.greedyCoverage(docs, rounds = 3).collect()
    assert(out.length === 3)
    // unpersist is async (blocking=false): poll briefly for the maps to drain
    val deadline = System.nanoTime() + 10e9.toLong
    var leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leftover.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(100)
      leftover = spark.sparkContext.getPersistentRDDs.keySet -- before
    }
    assert(leftover.isEmpty, s"greedyCoverage leaked cached RDDs: $leftover")
  }
}
