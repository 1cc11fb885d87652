package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classify, Graph}

/** Round-16 specs, part 1: the SPPMI decimal rank key (silent Long wrap
  * killed), and the maxVocab cutpoint through the distributed selection
  * machinery (global row_number window killed). */
class Round16Spec extends SparkSpec {
  import spark.implicits._

  private def withTopK[T](f: => T): T = {
    import graft.plans.GroupedTopKStrategy
    if (!spark.experimental.extraStrategies.exists(_ eq GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    f
  }

  test("sppmiTopKContexts: pmi_num·10⁶ past Long.MaxValue ranks correctly") {
    withTopK {
      // 9.3e12·10⁶ = 9.3e18 > Long.MaxValue (≈9.22e18): the pre-decimal
      // plan wrapped the product negative and ranked context 10 LAST.
      val pmi = Seq(
        (1L, 10L, 5L, 9300000000000L, 1000000L),
        (1L, 11L, 5L, 9250000000000L, 1000000L),
        (1L, 12L, 5L, 7L, 1L))
        .toDF("center", "context", "n_pairs", "pmi_num", "pmi_den")
      val got = Graph.sppmiTopKContexts(pmi, shift = 1L, k = 2)
        .select(col("context"), col("pmi_ratio_micros"))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(10L -> 9300000000000L, 11L -> 9250000000000L),
        s"got $got")
    }
  }

  test("sppmiTopKContexts: shift·pmi_den past Long.MaxValue filters correctly") {
    withTopK {
      // shift=10 × pmi_den=9.3e17 = 9.3e18 wraps negative as a Long, which
      // would have let this non-positive-PMI pair THROUGH the shift filter.
      val pmi = Seq(
        (1L, 10L, 5L, 900000000000000000L, 930000000000000000L),
        (1L, 11L, 5L, 64L, 2L))
        .toDF("center", "context", "n_pairs", "pmi_num", "pmi_den")
      val got = Graph.sppmiTopKContexts(pmi, shift = 10L, k = 5)
        .select(col("context")).as[Long].collect().toSet
      assert(got == Set(11L), s"got $got")
    }
  }

  /** Fixture with a COUNT TIE exactly at the maxVocab boundary: aa×5,
    * bb/cc/dd×3, ee×2, ff×1. minCount=2 floors ff; maxVocab=3 must keep
    * {aa, bb, cc} — the tie at count 3 breaks by term asc, dd drops. */
  private def tieTrain = Seq(
    (1L, "x", "aa aa aa aa aa"),
    (2L, "x", "bb bb bb cc cc"),
    (3L, "x", "cc dd dd dd ee ee ff"))
    .toDF("doc_id", "label", "text")

  test("NB maxVocab cutpoint: deterministic tie at the cut, no global window") {
    val model = Classify.naiveBayesModel(tieTrain, minCount = 2L, maxVocab = 3)
    val vocab = model.select(col("term")).distinct().as[String].collect().toSet
    assert(vocab == Set("aa", "bb", "cc"), s"got $vocab")
    // the plan must not contain a partition-less window (the PlanGuardSpec
    // exemption this rework removed)
    val hasGlobalWindow = model.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }.nonEmpty
    assert(!hasGlobalWindow, "maxVocab must not plan a global window")
    // weights re-base on the retained vocab: replay add-1 over {aa,bb,cc}
    val w = model.select(col("term"), col("cnt"), col("w_micros"))
      .as[(String, Long, Long)].collect()
      .map { case (t, c, wm) => t -> ((c, wm)) }.toMap
    val tot = 5L + 3L + 3L // retained counts of label x
    val v = 3L
    Seq(("aa", 5L), ("bb", 3L), ("cc", 3L)).foreach { case (t, c) =>
      val expect = math.round(1e6 * math.log((c + 1.0) / (tot + v)))
      assert(w(t) == ((c, expect)), s"$t: got ${w(t)}, expect ($c, $expect)")
    }
  }

  test("NB maxVocab larger than the floored vocab keeps everything") {
    val model = Classify.naiveBayesModel(tieTrain, minCount = 2L, maxVocab = 50)
    val vocab = model.select(col("term")).distinct().as[String].collect().toSet
    assert(vocab == Set("aa", "bb", "cc", "dd", "ee"), s"got $vocab")
  }
}
