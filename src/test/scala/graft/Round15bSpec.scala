package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classify, MediaCodecs}

/** Round-15 specs, part 2: the landmark (peak-gap) audio fingerprint's
  * exact invariances (ANY shift, positive gain, and their composition —
  * the class q381's frame probes honestly decline), the streaming NB
  * scoring tick's equivalence to the one-shot batch gate, and a
  * randomized plain-Scala replay of the NB vocabulary floor. */
class Round15bSpec extends SparkSpec {
  import spark.implicits._

  /** High-entropy stream: landmark keys only carry information when the
    * peak geometry does (smooth closed forms collapse the gap alphabet). */
  private def samples(n: Int, seed: Long): Array[Short] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)((rng.nextInt(20001) - 10000).toShort)
  }

  private def keys(s: Array[Short]): Set[Long] =
    MediaCodecs.audioPeakGapLandmarks(
      MediaCodecs.wavBytes(8000, 1, s)).get.toSet

  test("landmarks: positive gain without clipping is EXACTLY invariant") {
    val base = samples(4000, 3L)
    val gained = base.map(v => (v * 3).toShort) // |v| ≤ 10000 → no clipping
    assert(keys(base) == keys(gained))
  }

  test("landmarks: an ARBITRARY shift keeps every interior key") {
    val base = samples(4000, 5L)
    // 23 junk samples prepended — deliberately not a multiple of any frame
    // width; audioHashProbes cannot recover this class, landmarks must.
    val junk = Array.tabulate(23)(i => ((i * 31) % 700 - 350).toShort)
    val shifted = junk ++ base
    val kb = keys(base)
    val ks = keys(shifted)
    // only keys whose peak windows touch the splice can differ
    assert((kb -- ks).size <= 8,
      s"shift must preserve interior gaps: lost ${(kb -- ks).size} of ${kb.size}")
    assert((kb intersect ks).size * 10 >= kb.size * 8, s"${kb.size} vs ${ks.size}")
  }

  test("landmarks: shift AND gain compose; head trim keeps interior keys") {
    val base = samples(4000, 7L)
    val junk = Array.tabulate(37)(i => ((i * 17) % 1201 - 600).toShort)
    val shiftedGained = junk ++ base.map(v => (v * 2).toShort)
    val kb = keys(base)
    val kc = keys(shiftedGained)
    assert((kb intersect kc).size * 10 >= kb.size * 8,
      "a prepended AND gained copy still shares essentially all keys")
    val trimmed = base.drop(53)
    val kt = keys(trimmed)
    assert((kt -- kb).size <= 8, "trim introduces at most splice-local keys")
  }

  test("landmarks: too few peaks → None; non-WAV → None") {
    // monotone ramp has no interior peak
    val ramp = Array.tabulate(300)(i => (i * 10).toShort)
    assert(MediaCodecs.audioPeakGapLandmarks(
      MediaCodecs.wavBytes(8000, 1, ramp)).isEmpty)
    assert(MediaCodecs.audioPeakGapLandmarks(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q392 fixture: every planted sub-frame-shifted + gained copy is recovered") {
    val pairs = SparkEntry.queries("q392_audio_landmarks")(spark, "")
      .as[(Long, Long, Long)].collect()
    val planted = (0 until 40).filter(_ % 5 == 0)
      .map(id => (id.toLong, id + 1000L)).toSet
    val got = pairs.map(p => (p._1, p._2)).toSet
    assert(planted.subsetOf(got),
      s"missing planted pairs: ${planted -- got}")
    // planted pairs share essentially their whole strong-peak key set —
    // far above the threshold; two independent md5 streams share a given
    // ~26-bit key with probability ~90²/2²⁶, so organic pairs at ≥30
    // shared keys do not happen
    assert(got == planted, s"unexpected organic pairs: ${got -- planted}")
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(planted.forall(p => byPair(p) >= 60L),
      s"planted pairs should share most of their ~85 keys: $byPair")
  }

  test("streaming NB ticks ≡ one-shot batch scoring over the union") {
    withTempDir { root =>
      val train = Seq(
        (0L, "good", "alpha beta gamma alpha"),
        (1L, "good", "beta beta gamma"),
        (2L, "bad", "zap zap pow"),
        (3L, "bad", "pow zap kaboom"))
        .toDF("doc_id", "label", "text")
      val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val model = Classify.naiveBayesModel(train).persist(store)
      model.count()
      val classes = Classify.naiveBayesClasses(train).persist(store)
      classes.count()
      val docs = Seq(
        (10L, "alpha beta"), (11L, "zap pow"), (12L, "gamma gamma zap"),
        (13L, "beta"), (14L, "kaboom"), (15L, "alpha pow pow"))
        .toDF("doc_id", "text")
      // three landing files → three AvailableNow micro-batches
      Seq(0, 1, 2).foreach { k =>
        docs.where(col("doc_id") % 3 === k)
          .coalesce(1).write.mode("append").parquet(s"$root/landing")
      }
      val stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/landing")
      Classify.streamingNbScoreTick(stream, model, classes,
        s"$root/preds", s"$root/ckpt")
      val ticked = spark.read.parquet(s"$root/preds")
        .select(col("doc_id"), col("pred_label"), col("score_micros"))
        .as[(Long, String, Long)].collect().toSet
      val batch = Classify.naiveBayesScore(model, classes, docs)
        .as[(Long, String, Long)].collect().toSet
      assert(ticked == batch,
        "NB scoring is stateless per doc — summed ticks must equal the batch gate")
      // three batch-keyed partitions actually landed
      val nBatches = spark.read.parquet(s"$root/preds")
        .select(col("batch")).distinct().count()
      assert(nBatches == 3L, s"expected 3 ticks, got $nBatches")
      model.unpersist(); classes.unpersist()
    }
  }

  test("q391 fixture: streamed predictions equal the batch q378 predictions") {
    val streamed = SparkEntry.queries("q391_streaming_nb")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long)].collect().toSet
    val batch = SparkEntry.queries("q378_nb_predict")(
        spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("pred_label"), col("score_micros"))
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("NB vocabulary floor: randomized 8-corpus plain-Scala replay") {
    val rng = new scala.util.Random(1015L)
    val vocabPool = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
      "ii", "jj", "kk", "ll")
    for (trial <- 1 to 8) {
      val nDocs = 6 + rng.nextInt(10)
      val docs = (0 until nDocs).map { d =>
        val label = if (rng.nextBoolean()) "x" else "y"
        val words = (0 to rng.nextInt(8)).map(_ =>
          vocabPool(rng.nextInt(vocabPool.size)))
        (d.toLong, label, words.mkString(" "))
      }
      val minCount = 1L + rng.nextInt(3)
      val maxVocab = 1 + rng.nextInt(8)
      val got = Classify.naiveBayesModel(
          docs.toDF("doc_id", "label", "text"),
          minCount = minCount, maxVocab = maxVocab)
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      // plain-Scala replay
      val tokens = docs.flatMap { case (_, l, t) =>
        t.split("\\s+").filter(_.nonEmpty).map(w => (l, w)) }
      val cnt0 = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val termTot = cnt0.groupBy(_._1._2)
        .map { case (t, m) => t -> m.values.sum }
        .filter(_._2 >= minCount)
      val kept = termTot.toSeq.sortBy { case (t, n) => (-n, t) }
        .take(maxVocab).map(_._1).toSet
      val cnt = cnt0.filter { case ((_, t), _) => kept(t) }
      val tot = cnt.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
      val v = cnt.keys.map(_._2).toSet.size.toLong
      val expect = cnt.map { case ((l, t), c) =>
        (l, t) -> (c, math.round(1e6 * math.log((c + 1) * 1.0 / (tot(l) + v))))
      }
      assert(got == expect, s"trial $trial (minCount=$minCount maxVocab=$maxVocab)")
    }
  }
}
