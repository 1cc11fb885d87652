package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Sampling}

/** Round-11 second tranche: the sampled-slice recall mode, the explicit-
  * mixture quota allocator, and the one-pass novelty-decay curve. */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------- sampled recall audit (q218's 100 TB mode)

  test("sampleSlice: deterministic, bounded, and a strict subset") {
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Dedup.sampleSlice(docs, "doc_id", 400L, "recall-slice")
      .select("doc_id").as[Long].collect().sorted
    val b = Dedup.sampleSlice(docs, "doc_id", 400L, "recall-slice")
      .select("doc_id").as[Long].collect().sorted
    assert(a === b, "slice must be deterministic")
    assert(a.nonEmpty && a.length < 200, s"400‰ of 200 docs kept ${a.length}")
    // keepPermille = 1000 keeps everything
    assert(Dedup.sampleSlice(docs, "doc_id", 1000L, "recall-slice").count() === 200L)
    intercept[IllegalArgumentException] {
      Dedup.sampleSlice(docs, "doc_id", 0L, "s")
    }
  }

  test("sampled-slice recall estimate agrees with the full-corpus audit (planted corpus)") {
    val docs = SparkEntry.docsWithPlantedNearDups(spark, "/root/testdata/sf0.001")
    def audit(d: org.apache.spark.sql.DataFrame) = Dedup.recallAudit(
      Dedup.prefixFilterJaccardPairs(d, k = 3, tauMilli = 600L),
      Dedup.minhashNearDuplicatesPortable(d, threshold = 0.6),
      Seq("id_a", "id_b")).head()
    val full = audit(docs)
    val sliced = audit(Dedup.sampleSlice(docs, "doc_id", 400L, "recall-slice"))
    // the slice must retain enough surviving truth pairs to estimate from
    assert(sliced.getLong(0) > 0, "slice retained no ground-truth pairs")
    val rFull = full.getLong(4); val rSliced = sliced.getLong(4)
    assert(!full.isNullAt(4) && !sliced.isNullAt(4))
    // pinned integer tolerance: the sampled estimate of banding recall must
    // sit within ±150 milli of the full-corpus value on the planted corpus
    assert(math.abs(rFull - rSliced) <= 150L,
      s"sampled recall $rSliced vs full $rFull drifted past the pinned tolerance")
  }

  // ------------------------------- explicit-mixture quota allocation

  test("mixtureQuotas: quotas sum to the budget exactly and follow the weights") {
    val w = Seq(("a", 50L), ("b", 100L), ("c", 150L), ("d", 300L), ("e", 400L))
      .toDF("g", "tp")
    val byG = Sampling.mixtureQuotas(w, "g", "tp", total = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byG.values.sum === 300L, "Σquota must equal the budget exactly")
    // exact largest-remainder values: floors are 15/30/45/90/120 (Σ=300, no
    // leftover seats), so quotas are exactly proportional here
    assert(byG === Map("a" -> 15L, "b" -> 30L, "c" -> 45L, "d" -> 90L, "e" -> 120L))
  }

  test("mixtureQuotas: leftover seats go to the largest remainders, ties to smaller key") {
    // total 10 over weights 1,1,1 → floors 3,3,3, one leftover seat; all
    // remainders equal → the smallest group key gets the seat
    val w = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("g", "tp")
    val q = Sampling.mixtureQuotas(w, "g", "tp", total = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q === Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
  }

  test("mixtureQuotas: more groups than seats — zero floors, seats to the smallest keys") {
    // total 3 over 5 uniform groups: floors 0, remainders equal → the three
    // smallest group keys get the seats (q285's uniform-budget regime when
    // bucket count exceeds the sample budget)
    val w = Seq("a", "b", "c", "d", "e").map((_, 1L)).toDF("g", "tp")
    val q = Sampling.mixtureQuotas(w, "g", "tp", total = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q === Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L, "e" -> 0L))
  }

  test("largestRemainderQuotas still allocates proportional-to-count (delegation intact)") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")).toDF("g")
    val q = Sampling.largestRemainderQuotas(df, col("g"), total = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(q.toSet === Set(("a", 6L, 6L), ("b", 3L, 3L), ("c", 1L, 1L)))
  }

  // ------------------------------- one-pass novelty decay

  test("noveltyDecayByBatch matches the hand-computed two-batch example") {
    // batch 0: shingles {a b c, b c d}; batch 1: {a b c, b c x} — one of
    // two seen → novelty 500; EWMA: 1000, then (700·1000 + 300·500)/1000 = 850
    val docs = Seq((1L, 0L, "a b c d"), (2L, 1L, "a b c x"))
      .toDF("doc_id", "batch", "text")
    val out = Dedup.noveltyDecayByBatch(docs, "batch")
      .orderBy("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0L, 2L, 0L, 1000L, 1000L),
      (1L, 2L, 1L, 500L, 850L)))
  }

  test("noveltyDecayByBatch: within-batch repeats do not count as seen") {
    // two docs in the SAME batch sharing every shingle: first-seen batch
    // equals their batch, so nothing is "seen" — novelty stays 1000
    val docs = Seq((1L, 0L, "p q r s"), (2L, 0L, "p q r s"))
      .toDF("doc_id", "batch", "text")
    val out = Dedup.noveltyDecayByBatch(docs, "batch").collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((4L, 0L, 1000L)))
  }
}
