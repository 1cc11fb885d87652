package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Round-14 specs, part 4: the hub-window cap for keep-first substring
  * dedup — planted hub diverted, organic duplicates untouched, audit rows
  * exact, and cap-inactive ≡ the uncapped operator. */
class Round14dSpec extends SparkSpec {
  import spark.implicits._

  // 54-char organic duplicate (2 occurrences — always under any cap ≥ 2)
  private val organic = "the quick brown fox jumps over the lazy dog repeatedly"
  // 40-char boilerplate hub shared by 5 docs → 11 windows × 5 occurrences
  private val boiler = "COMMON-LICENSE-FOOTER-SHARED-EVERYWHERE."

  /** 16-char doc-unique affixes, shorter than a window so no 30-char
    * window ever lies fully inside one, and differing from every other
    * doc's affix at EVERY position (offset step 7 and stride 11 are both
    * invertible mod 26), so straddling windows are doc-unique. */
  private def seqStr(o: Int): String =
    (0 until 16).map(j => ('a' + ((o + j * 11) % 26)).toChar).mkString
  private def pre(i: Int) = seqStr(i * 7)
  private def suf(i: Int) = seqStr(i * 7 + 13)

  private def corpus = {
    val hubDocs = (3 to 7).map(i => (i.toLong, pre(i) + boiler))
    (Seq((1L, pre(1) + organic + suf(1)),
         (2L, pre(2) + organic + suf(2))) ++ hubDocs)
      .toDF("doc_id", "text")
  }

  test("capped keep-first: the 5-occurrence hub is diverted, the organic pair still dedups") {
    val spans = Dedup.duplicateSubstringSpansKeepFirstCapped(
        corpus, minLen = 30, maxOccurrences = 4L)
      .as[(Long, Long, Long)].collect()
    // keep-first: doc 1's organic copy survives, doc 2's is the only
    // removal span left once the hub windows are over cap
    assert(spans.toSeq == Seq((2L, 17L, 70L)),
      s"only doc 2's organic copy is a removal span, got ${spans.toSeq}")
    val uncapped = Dedup.duplicateSubstringSpansKeepFirst(corpus, minLen = 30)
      .as[(Long, Long, Long)].collect()
    assert(uncapped.map(_._1).toSet == Set(2L, 4L, 5L, 6L, 7L),
      "without the cap, docs 4..7 lose their boilerplate to doc 3's first copy")
  }

  test("hub audit: exactly the 11 boilerplate windows, each at 5 occurrences") {
    val audit = Dedup.substringHubAudit(corpus, minLen = 30,
        maxOccurrences = 4L)
      .as[(Long, Long)].collect()
    assert(audit.length == 11, s"40-char hub → 11 interior windows, got ${audit.length}")
    assert(audit.forall(_._2 == 5L))
    assert(audit.map(_._1).distinct.length == 11, "hashes must be distinct windows")
  }

  test("an inactive cap is the identity: capped(huge) ≡ uncapped keep-first") {
    val capped = Dedup.duplicateSubstringSpansKeepFirstCapped(
        corpus, minLen = 30, maxOccurrences = 1000000L)
      .as[(Long, Long, Long)].collect().toSet
    val plain = Dedup.duplicateSubstringSpansKeepFirst(corpus, minLen = 30)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == plain)
  }

  test("q382/q383 at sf0.001: the 10 license windows are audited at 167 and their mass diverted") {
    val sf = "/root/testdata/sf0.001"
    val audit = SparkEntry.queries("q383_substring_hub_audit")(spark, sf)
      .as[(Long, Long)].collect()
    assert(audit.length == 10 && audit.forall(_._2 == 167L),
      s"500 docs, every 3rd suffixed → 10 windows × 167, got ${audit.toSeq}")
    val docs = spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" LICENSE-BOILERPLATE-SHARED-ACROSS-DOC.")))
        .otherwise(col("text")).as("text"))
    val cappedMass = SparkEntry.queries("q382_substring_capped_dedup")(spark, sf)
      .agg(sum(col("removed_chars"))).as[Long].head()
    val uncappedMass = Dedup.duplicateSubstringSpansKeepFirst(docs, minLen = 30)
      .agg(sum(col("span_end") - col("span_start") + 1L)).as[Long].head()
    assert(cappedMass < uncappedMass,
      s"diverting the hub must strictly reduce removal mass ($cappedMass vs $uncappedMass)")
  }
}
