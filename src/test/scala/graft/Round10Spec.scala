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
