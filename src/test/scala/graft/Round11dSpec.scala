package graft

import org.apache.spark.sql.functions._
import graft.ext.{Fuzzy, TextAnalysis}
import org.apache.spark.unsafe.types.UTF8String

/** Round-11 fourth tranche: boilerplate detection, the Jaro–Winkler codegen
  * kernel (DuckDB-contract pinned), and blocked JW linkage. */
class Round11dSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------- TextAnalysis.boilerplateBySource

  test("boilerplateBySource: a phrase shared by most of a source is flagged, rare content is not") {
    // 10 docs; 8 share the 3-gram "terms of service" (df 8/10 > 1/5);
    // each doc also has a unique 3-word tail (df 1/10 -> content).
    val docs = (1 to 10).map { i =>
      val boiler = if (i <= 8) "terms of service " else "totally unique head "
      (i.toLong, "s1", boiler + s"tail$i word$i end$i")
    }.toDF("doc_id", "source", "text")
    val r = TextAnalysis.boilerplateBySource(docs).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_docs") === 10L)
    // per doc: 4 distinct shingles ("a b c", "b c d", "c d e", "d e f" over
    // 6 words) -> 40 occurrences total
    assert(row.getAs[Long]("n_shingles") === 40L)
    // flagged: "terms of service" (df 8) and "of service tailN"? no — tails
    // differ per doc, so only the shared full shingle passes df*5 > 10.
    assert(row.getAs[Long]("n_boiler") === 8L)
    assert(row.getAs[Long]("boiler_permille") === 200L)
  }

  test("boilerplateBySource: df threshold is per source, not global") {
    // the same phrase is boilerplate in s1 (3/3 docs) but content in s2
    // (1/5 docs): per-source df must flag only s1's occurrences.
    val s1 = (1 to 3).map(i => (i.toLong, "s1", s"call us now x$i y$i"))
    val s2 = (11 to 15).map(i =>
      (i.toLong, "s2", (if (i == 11) "call us now" else s"other text body$i") + s" p$i q$i"))
    val r = TextAnalysis.boilerplateBySource((s1 ++ s2).toDF("doc_id", "source", "text"))
      .collect().map(x => x.getString(0) -> x.getAs[Long]("n_boiler")).toMap
    assert(r("s1") >= 3L, "shared phrase must be flagged in the dense source")
    assert(r("s2") === 0L, "1/5 df must not flag in the sparse source")
  }

  // ------------------------------------------- functions.JaroWinkler kernel

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("JaroWinkler kernel matches DuckDB's jaro_winkler_similarity (probed contract)") {
    // values probed from DuckDB jaro_winkler_similarity this round
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("aXXXXX", "aYYYYY", 0.4444444444444444), // jaro <= .7: no boost
      ("abc", "abc", 1.0),
      ("abc", "", 0.0),
      ("", "", 0.0),                            // DuckDB: empty -> 0, not 1
      ("CRATE", "TRACE", 0.7333333333333334),
      ("ab", "ba", 0.0),                        // window 0 blocks the swap
      ("a", "a", 1.0),                          // window 0 still matches i==j
      ("abcdXX", "abcdYY", 0.8666666666666666), // prefix capped at 4
      ("abcdef", "abdcef", 0.9555555555555556), // one transposition
      ("aaa", "aaaa", 0.9416666666666667),
      ("héllo", "hèllo", 0.9111111111111112))   // BYTES, not code points
    cases.foreach { case (a, b, want) =>
      assert(math.abs(jw(a, b) - want) < 1e-9, s"jw($a, $b)")
    }
  }

  test("JaroWinkler via SQL name and Column API agree with the kernel (codegen path)") {
    spark.sql("SELECT 1").count() // session warm
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (null, "x"))
      .toDF("a", "b")
    val viaCol = df.select(Fuzzy.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(viaCol(0) === 0.961111)
    assert(viaCol(1) === 0.813333)
    assert(viaCol(2) === null, "null input -> null")
    df.createOrReplaceTempView("jwt")
    val viaSql = spark.sql(
      "SELECT round(graft_jaro_winkler(a, b), 6) FROM jwt WHERE a IS NOT NULL")
      .collect().map(_.getDouble(0)).sorted
    assert(viaSql.toSeq === Seq(0.813333, 0.961111))
  }

  // --------------------------------------------------------- Rank.ndcgMicros

  test("ndcgMicros: hand-computed DCG/IDCG, k truncation, all-zero relevance") {
    val df = Seq(
      ("u1", 100L, 3L, 1L), ("u1", 90L, 0L, 2L), ("u1", 80L, 2L, 3L),
      ("u2", 50L, 0L, 4L), ("u2", 40L, 0L, 5L))
      .toDF("g", "score", "rel", "id")
    val disc = graft.ext.Rank.ndcgDiscountsMicros(10)
    assert(disc.take(3) === Seq(1000000L, 630929L, 500000L))
    val full = graft.ext.Rank.ndcgMicros(df, "g", "score", "rel", "id", 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // u1 model order 1,2,3 -> 3·1e6 + 0 + 2·5e5; ideal 1(3),3(2),2(0)
    assert(full("u1") === ((3000000L + 1000000L,
      3000000L + 2L * 630929L)))
    assert(full("u2") === ((0L, 0L)), "all-zero relevance contributes 0/0")
    val k2 = graft.ext.Rank.ndcgMicros(df, "g", "score", "rel", "id", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(k2("u1") === ((3000000L, 3000000L + 2L * 630929L)))
  }

  // ------------------------------------------------------ Fuzzy.jwBestMatch

  test("jwBestMatch: argmax within block, ties by id, cross-block pairs never considered") {
    val corpus = Seq((1L, "alpha", "g1"), (2L, "alphb", "g1"), (3L, "alpha", "g2"))
      .toDF("id", "name", "blk")
    val queries = Seq((10L, "alpha", "g1")).toDF("qid", "qname", "blk")
    val got = Fuzzy.jwBestMatch(
      queries, "qid", col("qname"), col("blk"),
      corpus, "id", col("name"), col("blk")).collect()
    assert(got.length === 1)
    // id 3 is an exact match but in another block; within g1 the exact
    // match id 1 wins over the 1-sub id 2
    assert(got.head.getLong(0) === 10L && got.head.getLong(1) === 1L
      && got.head.getDouble(2) === 1.0)
  }
}
