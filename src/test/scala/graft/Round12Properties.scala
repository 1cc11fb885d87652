package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.{Dedup, Graph, MediaCodecs}

/** Property sweeps for the round-12 operators: structural laws on GENERATED
  * inputs — incremental-CC fold ≡ one-shot under arbitrary edge/batch
  * splits, substring-span completeness against the naive all-lengths
  * oracle, Hamming pigeonhole exactness, and perceptual-hash brightness
  * invariance.
  */
class Round12Properties extends Properties("Round12Ops") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  // --------------------------------------- incrementalComponents fold law

  private val edgeSet: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(4, 24)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 20L); b <- Gen.choose(1L, 20L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  private def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
    import spark.implicits._
    df.select(col("id"), col("component")).as[(Long, Long)].collect().toMap
  }

  property("incrementalComponents: any batch split folds to the one-shot labels") =
    forAll(edgeSet, Gen.choose(0, 3)) { (edges, saltI) =>
      import spark.implicits._
      edges.size < 2 || {
        // deterministic but salt-varied split into two batches
        val (b1, b2) = edges.partition { case (a, b) => (a + b + saltI) % 2 == 0 }
        val all = edges.toDF("id_a", "id_b")
        val oneShot = labelMap(Graph.connectedComponents(all))
        val folded =
          if (b1.isEmpty) labelMap(Graph.incrementalComponents(
            Graph.connectedComponents(spark.emptyDataset[(Long, Long)]
              .toDF("id_a", "id_b")), all))
          else labelMap(Graph.incrementalComponents(
            Graph.connectedComponents(b1.toDF("id_a", "id_b")),
            b2.toDF("id_a", "id_b")))
        folded == oneShot
      }
    }

  // ------------------------------- duplicateSubstringSpans completeness

  private val lowAlphaCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 5)
    docs <- Gen.listOfN(nDocs,
      Gen.listOfN(24, Gen.oneOf('a', 'b')).map(_.mkString))
  } yield docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }

  /** Naive Lee-et-al cover: chars inside ANY ≥L substring occurring ≥2×. */
  private def naiveCover(corpus: List[(Long, String)], l: Int): Map[Long, Set[Long]] = {
    def occ(s: String): Int = corpus.map { case (_, t) =>
      Iterator.iterate(t.indexOf(s))(i => t.indexOf(s, i + 1)).takeWhile(_ >= 0).size
    }.sum
    corpus.map { case (id, t) =>
      id -> (for {
        i <- 0 until t.length; len <- l to (t.length - i)
        if occ(t.substring(i, i + len)) >= 2
      } yield (i until i + len)).flatten.map(_.toLong + 1L).toSet
    }.toMap.filter(_._2.nonEmpty)
  }

  property("duplicateSubstringSpans: covered chars equal the naive all-lengths cover") =
    forAll(lowAlphaCorpus, Gen.choose(4, 7)) { (corpus, l) =>
      import spark.implicits._
      val spans = Dedup.duplicateSubstringSpans(
          corpus.toDF("doc_id", "text"), minLen = l)
        .as[(Long, Long, Long)].collect()
      val got = spans.groupBy(_._1).map { case (id, ss) =>
        id -> ss.flatMap { case (_, a, b) => (a to b) }.toSet
      }
      got == naiveCover(corpus, l)
    }

  property("keep-first spans cover exactly the non-first window occurrences") =
    forAll(lowAlphaCorpus, Gen.choose(4, 7)) { (corpus, l) =>
      import spark.implicits._
      val spans = Dedup.duplicateSubstringSpansKeepFirst(
          corpus.toDF("doc_id", "text"), minLen = l)
        .as[(Long, Long, Long)].collect()
      val got = spans.flatMap { case (d, a, b) => (a to b).map(d -> _) }.toSet
      val windows = corpus.flatMap { case (id, t) =>
        (0 to t.length - l).map(i => (id, i + 1L, t.substring(i, i + l))) }
      val naive = windows.groupBy(_._3).values
        .flatMap(_.sortBy(w => (w._1, w._2)).drop(1))
        .flatMap(w => (w._2 until w._2 + l).map(w._1 -> _)).toSet
      got == naive
    }

  // --------------------------------------- hammingNearDuplicates exactness

  private val sigTable: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(5, 20)
    sigs <- Gen.listOfN(n, Gen.long)
    flips <- Gen.choose(0, 7)
  } yield {
    val base = sigs.zipWithIndex.map { case (s, i) => (i + 1L, s) }
    // plant one near pair: copy of row 1 with `flips` bits flipped
    val planted = (100L,
      (0 until flips).foldLeft(base.head._2)((s, j) => s ^ (1L << (j * 9))))
    base :+ planted
  }

  property("hammingNearDuplicates equals the naive all-pairs join") =
    forAll(sigTable, Gen.oneOf(3, 7)) { (rows, d) =>
      import spark.implicits._
      val got = Dedup.hammingNearDuplicates(
          rows.toDF("id", "sig"), "id", "sig", d, 64)
        .as[(Long, Long, Long)].collect().toSet
      val naive = (for {
        (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
        hm = java.lang.Long.bitCount(sa ^ sb).toLong if hm <= d
      } yield (ia, ib, hm)).toSet
      got == naive
    }

  // -------------------------------- perceptual-hash brightness invariance

  private val textureGen: Gen[(Int, Int, Long)] = for {
    w <- Gen.choose(9, 20); h <- Gen.choose(8, 16); seed <- Gen.choose(0L, 999L)
  } yield (w, h, seed)

  property("aHash64/dHash64 are invariant to any uniform non-clipping shift") =
    forAll(textureGen, Gen.choose(1, 50)) { case ((w, h, seed), shift) =>
      def base(x: Int, y: Int) = (
        ((x * x * (3 + seed % 7) + y * y * (5 + seed % 11) + 37 * seed) % 200).toInt,
        ((x * x * (2 + seed % 5) + x * y * (2 + seed % 11) + 11 * seed) % 200).toInt,
        ((y * y * (4 + seed % 13) + x * y * (3 + seed % 7) + 23 * seed) % 200).toInt)
      val a = MediaCodecs.bmpBytes(w, h, base)
      val b = MediaCodecs.bmpBytes(w, h, (x, y) => {
        val (r, g, bl) = base(x, y); (r + shift, g + shift, bl + shift)
      })
      MediaCodecs.aHash64(a) == MediaCodecs.aHash64(b) &&
        MediaCodecs.dHash64(a) == MediaCodecs.dHash64(b) &&
        MediaCodecs.aHash64(a).isDefined
    }
}
