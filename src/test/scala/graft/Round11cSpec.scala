package graft

import org.apache.spark.sql.functions._
import graft.ext.{Calibration, Packing, Rank, Similarity}

/** Round-11 third tranche: eval/curation metrics — reliability-diagram ECE
  * bins, exact midrank AUC, mutual top-1 neighbor mining, and the
  * padding-waste batching audit. */
class Round11cSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------- Calibration.eceBins

  test("eceBins: perfectly calibrated bins have zero gap; known gaps add up") {
    // two rows at confidence 500, one positive -> Σy·1000 = Σconf -> gap 0
    // two rows at confidence 900, both negative -> gap = |0 - 1800| = 1800
    val df = Seq((500L, 1L), (500L, 0L), (900L, 0L), (900L, 0L))
      .toDF("sp", "y")
    val bins = Calibration.eceBins(df, "sp", "y", bins = 10)
      .orderBy("bin").collect()
    assert(bins.map(_.getLong(0)).toSeq === Seq(5L, 9L))
    val byBin = bins.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byBin(5L) === ((2L, 1L, 1000L, 0L)))
    assert(byBin(9L) === ((2L, 0L, 1800L, 1800L)))
  }

  test("eceBins: rejects a bin count that does not divide 1000") {
    intercept[IllegalArgumentException] {
      Calibration.eceBins(Seq((1L, 1L)).toDF("sp", "y"), "sp", "y", bins = 3)
    }
  }

  // --------------------------------------------------------- Rank.aucStats

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, java.math.BigDecimal) =
    graft.engine.Scratch.withTempDir("auc-spec-") { tmp =>
      val df = rows.zipWithIndex
        .map { case ((v, y), i) => (i.toLong, v, y) }.toDF("id", "v", "y")
      val r = Rank.aucStats(df, "v", "y", "id", tmp).collect().head
      (r.getLong(0), r.getLong(1), r.getDecimal(2))
    }

  test("aucStats: perfect separation gives AUC 1, reversed gives 0") {
    // positives all score above negatives: 2U = 2·np·nn
    val (np, nn, twoU) = auc(Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L)))
    assert((np, nn) === ((2L, 2L)))
    assert(twoU.longValueExact() === 2L * np * nn)
    val (_, _, rev) = auc(Seq((10L, 0L), (9L, 0L), (2L, 1L), (1L, 1L)))
    assert(rev.longValueExact() === 0L)
  }

  test("aucStats: all-tied scores give AUC exactly 1/2 via midranks") {
    val (np, nn, twoU) = auc(Seq((7L, 1L), (7L, 1L), (7L, 0L), (7L, 0L), (7L, 0L)))
    assert((np, nn) === ((2L, 3L)))
    // AUC = 2U / (2·np·nn) = 1/2 -> 2U = np·nn
    assert(twoU.longValueExact() === np * nn)
  }

  test("aucStats: hand-computed mixed case with a tie straddling classes") {
    // scores: pos {3, 2}, neg {2, 1}. Pairs: (3>2)=1, (3>1)=1, (2=2)=.5,
    // (2>1)=1 -> U = 3.5 -> 2U = 7
    val (np, nn, twoU) = auc(Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)))
    assert((np, nn) === ((2L, 2L)))
    assert(twoU.longValueExact() === 7L)
  }

  // ------------------------------------------------ Similarity.mutualTopOne

  test("mutualTopOne: reciprocal pairs only, id tie-breaks, bits=0 exact mode") {
    // dim-2 embeddings, one bucket (bits = 0). Left: a1=(1,0), a2=(0,1),
    // a3=(1,1)/norm. Right: b1=(1,0), b2=(0,1).
    // a1<->b1 and a2<->b2 are mutual; a3's best is b1 (cos .707107, tie with
    // b2 broken by id) but b1 prefers a1 (cos 1.0) -> a3 unpaired.
    val left = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val right = Seq((11L, Seq(1f, 0f)), (12L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(left, right, bits = 0, dim = 2)
      .orderBy("a_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 11L, 1.0), (2L, 12L, 1.0)))
  }

  test("mutualTopOne: blocking drops cross-bucket pairs but keeps within-bucket ones") {
    // With bits > 0, a pair only forms if both vectors share a bucket; a
    // vector and its negation always differ in every sign bit, so the
    // (v, -v) "pair" is never a candidate, while (v, v) is.
    val v = Seq.tabulate(64)(i => (if (i % 3 == 0) 1f else -0.5f))
    val neg = v.map(x => -x)
    val left = Seq((1L, v)).toDF("vec_id", "embedding")
    val right = Seq((21L, neg), (22L, v)).toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(left, right, bits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 22L)))
  }

  // ------------------------------------------------- Packing.paddingWaste

  test("paddingWaste: sorted waste never exceeds arrival waste; equal-length corpus wastes nothing") {
    val docs = (1L to 100L).map(i => (i, (i * 37) % 50 + 1)).toDF("id", "tok")
    val rows = Packing.paddingWaste(docs, col("id"), col("tok"),
      batchSize = 8, streams = 4)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, realA, padA, wasteA) = rows("arrival")
    val (_, realS, padS, wasteS) = rows("sorted")
    assert(realA === realS, "real token total is strategy-invariant")
    assert(padS <= padA, "length-sorting can only reduce padding")
    assert(wasteS <= wasteA)
    assert(padA >= realA && padS >= realS)

    val flat = (1L to 40L).map(i => (i, 10L)).toDF("id", "tok")
    val f = Packing.paddingWaste(flat, col("id"), col("tok"), 8, 2)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(f("arrival") === 0L && f("sorted") === 0L)
  }
}
