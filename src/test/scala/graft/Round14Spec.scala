package graft

import org.apache.spark.sql.functions._
import graft.ext.Classify

/** Round-14 specs, part 1: the integer-exact Naive Bayes quality
  * classifier (train invariances, held-out accuracy on the separable
  * fixture, partitioning-invariance of the scores). */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  /** Tiny hand corpus: class 'a' speaks {red, blue}, class 'b' speaks
    * {green, yellow}; 'cat' is common to both. */
  private def corpus = Seq(
    (0L, "a", "red blue red cat"),
    (1L, "a", "blue blue cat"),
    (2L, "b", "green yellow cat"),
    (3L, "b", "yellow green green cat"))
    .toDF("doc_id", "label", "text")

  test("naiveBayesModel: counts and add-1 weights match the hand computation") {
    val m = Classify.naiveBayesModel(corpus)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // class a: 7 tokens, class b: 7 tokens, vocab = 5 distinct terms
    assert(m(("a", "red"))._1 == 2L && m(("a", "blue"))._1 == 3L
      && m(("a", "cat"))._1 == 2L)
    assert(m(("b", "green"))._1 == 3L && m(("b", "yellow"))._1 == 2L
      && m(("b", "cat"))._1 == 2L)
    def w(cnt: Long, tot: Long): Long =
      math.round(1e6 * math.log((cnt + 1) * 1.0 / (tot + 5)))
    assert(m(("a", "red"))._2 == w(2, 7))
    assert(m(("b", "green"))._2 == w(3, 7))
    // no cross-class rows for unseen terms
    assert(!m.contains(("a", "green")) && !m.contains(("b", "red")))
  }

  test("naiveBayesPredict: class-typical docs classify correctly; OOV-only doc absent") {
    val toScore = Seq(
      (10L, "red blue blue"),     // pure class-a vocabulary
      (11L, "green green yellow"), // pure class-b vocabulary
      (12L, "cat"),               // common term only → decided by totals/prior
      (13L, "zebra quux"))        // fully out-of-vocabulary → no score
    .toDF("doc_id", "text")
    val p = Classify.naiveBayesPredict(corpus, toScore)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(p(10L) == "a" && p(11L) == "b")
    assert(!p.contains(13L), "an all-OOV doc has no score and must be absent")
    // 'cat': both classes saw it twice with equal totals and equal priors
    // — an exact score tie, resolved to the lexicographically smaller label.
    assert(p(12L) == "a")
  }

  test("naiveBayesPredict: scores are invariant to input partitioning") {
    val toScore = Seq((10L, "red blue cat"), (11L, "green cat"),
      (12L, "yellow yellow red")).toDF("doc_id", "text")
    val base = Classify.naiveBayesPredict(corpus, toScore)
      .as[(Long, String, Long)].collect().toSet
    val repart = Classify.naiveBayesPredict(
      corpus.repartition(7), toScore.repartition(13))
      .as[(Long, String, Long)].collect().toSet
    assert(base == repart,
      "integer micro-weight sums are commutative — repartitioning must not move a score")
  }

  test("q378 fixture: 100% held-out accuracy and both classes present") {
    val out = SparkEntry.queries("q378_nb_predict")(spark, "/root/testdata/sf0.001")
      .as[(Long, String, String, Long)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2 == r._3),
      "the spam suffix is disjoint from the corpus vocabulary — held-out accuracy must be exact")
    assert(out.map(_._2).toSet == Set("good", "bad"))
  }

  test("q388 confusion matrix: exactly diagonal on the separable fixture") {
    val cells = SparkEntry.queries("q388_nb_confusion")(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long, Long)].collect()
    assert(cells.length == 2, s"got ${cells.toSeq}")
    assert(cells.forall(c => c._1 == c._2), "off-diagonal cells would mean misclassification")
    assert(cells.map(_._3).sum == 250L)
  }

  test("q379 funnel: NB stage drops exactly the planted spam, dedup exactly the copies") {
    val rows = SparkEntry.queries("q379_funnel_nb")(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    val nDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").count()
    val nSpam = (0L until nDocs).count(_ % 4 == 1)
    val nCopy = (0L until nDocs).count(_ % 5 == 0)
    assert(rows("all")._2 == nDocs + nSpam + nCopy)
    assert(rows("nb_quality")._3 == nSpam, "every planted spam doc must be dropped")
    assert(rows("exact_dedup")._3 == nCopy, "every exact copy must be dropped")
    assert(rows("exact_dedup")._2 == nDocs)
  }
}
