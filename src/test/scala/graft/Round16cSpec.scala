package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{Classify, Dedup, TextAnalysis}

/** Round-16 specs, part 3: the COMPOSED streaming curation tick —
  * heuristic gates → exact-dedup ledger → NB gate in ONE tick — equals
  * the one-shot batch funnel-with-NB over the same corpus, and replays
  * exactly-once from its checkpoint. */
class Round16cSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a", "of", "and", "is")
  private val spam = " win free click buy" * 3
  private def goodText(tag: String): String =
    ("the quick brown fox jumps over a lazy dog of the hill and it is warm " * 8) + tag

  private def trainDf: DataFrame = (1 to 40).map { i =>
    if (i % 2 == 1) (i.toLong, "bad", goodText(s"t$i") + spam)
    else (i.toLong, "good", goodText(s"t$i"))
  }.toDF("doc_id", "label", "text")

  // tick 1: two keepers, a Spanish doc, a spammy doc; tick 2: a keeper, a
  // too-short doc, a cross-tick DUPLICATE of doc 101; tick 3: a keeper
  private def tick1 = Seq(
    (101L, goodText("a1")), (102L, goodText("a2")),
    (105L, "el la de que es el la de que es el la de que es"),
    (108L, goodText("a8") + spam))
  private def tick2 = Seq(
    (103L, goodText("a3")), (106L, "the cat is a dog of and"),
    (201L, goodText("a1")))
  private def tick3 = Seq((104L, goodText("a4")))

  test("summed composed ticks ≡ one-shot batch funnel-with-NB") {
    withTempDir { root =>
      val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val model = Classify.naiveBayesModel(trainDf).persist(store)
      model.count()
      val classes = Classify.naiveBayesClasses(trainDf).persist(store)
      classes.count()
      Seq(tick1, tick2, tick3).foreach(t =>
        t.toDF("doc_id", "text").coalesce(1)
          .write.mode("append").parquet(s"$root/landing"))
      def stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/landing")
      Dedup.streamingFunnelNbTick(stream, model, classes, "good",
        s"$root/ledger", s"$root/silver", s"$root/counts", s"$root/ckpt",
        minTokens = 20L, stopwords = stop)

      // batch reference over the union, same primitives
      val all = (tick1 ++ tick2 ++ tick3).toDF("doc_id", "text")
      val flags = all
        .withColumn("pass1", TextAnalysis.langId(col("text")) === "en")
        .withColumn("pass2",
          col("pass1") && TextAnalysis.tokenCount(col("text")) >= 20L)
        .withColumn("pass3", col("pass2")
          && TextAnalysis.qualityScore(col("text"), stop) >= 0.5)
        .withColumn("fp", md5(lower(trim(col("text")))))
      val first = flags.where(col("pass3"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .withColumn("__first", lit(true))
      val f4 = flags.join(first, Seq("fp", "doc_id"), "left")
        .withColumn("pass4",
          col("pass3") && coalesce(col("__first"), lit(false)))
      val nbKeep = Classify.naiveBayesScore(model, classes,
          f4.where(col("pass4")).select(col("doc_id"), col("text")))
        .where(col("pred_label") === "good")
        .select(col("doc_id"), lit(true).as("__nb"))
      val f5 = f4.join(nbKeep, Seq("doc_id"), "left")
        .withColumn("pass5",
          col("pass4") && coalesce(col("__nb"), lit(false)))
      val expCounts = f5.agg(count(lit(1)), sum(col("pass1").cast("long")),
          sum(col("pass2").cast("long")), sum(col("pass3").cast("long")),
          sum(col("pass4").cast("long")), sum(col("pass5").cast("long")))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val gotCounts = spark.read.parquet(s"$root/counts")
        .agg(sum(col("c0")), sum(col("c1")), sum(col("c2")), sum(col("c3")),
          sum(col("c4")), sum(col("c5")))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      assert(gotCounts == expCounts, s"got $gotCounts, expect $expCounts")
      // 8 docs; 105 fails lang; 106 fails min-tokens; 201 falls to the
      // cross-tick ledger; 108 falls to the NB gate
      assert(expCounts == ((8L, 7L, 6L, 6L, 5L, 4L)), s"fixture: $expCounts")

      val gotSilver = spark.read.parquet(s"$root/silver")
        .select(col("doc_id")).as[Long].collect().toSet
      val expSilver = f5.where(col("pass5")).select(col("doc_id"))
        .as[Long].collect().toSet
      assert(gotSilver == expSilver && gotSilver == Set(101L, 102L, 103L, 104L)
        // the spammy 108 fell to the NB gate; 201 fell to the ledger
        , s"got $gotSilver")

      // exactly-once: re-running from the same checkpoint with no new
      // data changes nothing
      Dedup.streamingFunnelNbTick(stream, model, classes, "good",
        s"$root/ledger", s"$root/silver", s"$root/counts", s"$root/ckpt",
        minTokens = 20L, stopwords = stop)
      val again = spark.read.parquet(s"$root/counts")
        .agg(sum(col("c0")), sum(col("c1")), sum(col("c2")), sum(col("c3")),
          sum(col("c4")), sum(col("c5")))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      assert(again == expCounts, s"replay changed counts: $again")
      model.unpersist(); classes.unpersist()
    }
  }

  test("packedSequenceDedup: later sequence loses the boilerplate, first keeps it") {
    // buckets=1 ⇒ one id-ordered stream; 10-token docs, budget 20 ⇒
    // bins {1,2} and {3,4}. doc 3 repeats doc 1's text verbatim, so
    // sequence (0,1) carries a duplicated prefix; the corpus-first copy
    // in sequence (0,0) is untouched.
    val boiler =
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet" // 62ch
    val docs = Seq(
      (1L, boiler),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, boiler),
      (4L, "uno dos tres quatro cinco seis siete ocho nueve diez"))
      .toDF("doc_id", "text")
    val out = graft.ext.Dedup.packedSequenceDedup(docs, budget = 20L,
        buckets = 1, minLen = 30, maxDupPermille = 500L)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => (r._2, r)).toMap
    assert(out.size == 2)
    val (_, b0) = (0L, out(0L))
    // seq 0: 62 + 1 + 48 chars, first copy — zero removal
    assert(b0 == ((0L, 0L, 111L, 0L, 0L, true)), s"got $b0")
    // seq 1: 62 + 1 + 52 chars; dup windows start at 1..34 (the last one
    // still ends on the shared newline) ⇒ one span of 63 chars;
    // 63·1000 DIV 115 = 547 > 500 ⇒ dropped
    val b1 = out(1L)
    assert(b1 == ((0L, 1L, 115L, 63L, 547L, false)), s"got $b1")
  }
}
