package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.ext.{Dedup, Sampling, TimeSeries}

/** Property sweeps for the round-9 operators whose correctness rests on
  * algebraic invariants rather than fixed examples: order-invariance of the
  * sweep-line passes, conservation laws of the allocators, idempotence of
  * canonicalization. Each case batches its rows into one Spark job.
  */
class Round9Properties extends Properties("Round9Ops") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val intervals: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      s <- Gen.choose(0L, 500L)
      len <- Gen.choose(1L, 120L)
    } yield (s, s + len))

  property("peakConcurrency is invariant under input row order") = forAll(intervals) { iv =>
    import spark.implicits._
    def peak(rows: List[(Long, Long)]): Seq[(Long, Long)] =
      TimeSeries.peakConcurrency(
          rows.map { case (s, e) => ("k", s, e) }.toDF("key", "s", "e"),
          "key", col("s"), col("e"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    iv.isEmpty || peak(iv) == peak(iv.reverse)
  }

  property("intervalUnion coverage is bounded by span and at least the longest interval") =
    forAll(intervals) { iv =>
      import spark.implicits._
      iv.isEmpty || {
        val r = TimeSeries.intervalUnion(
            iv.map { case (s, e) => ("k", s, e) }.toDF("key", "s", "e"),
            "key", col("s"), col("e")).collect().head
        val covered = r.getLong(3)
        val span = iv.map(_._2).max - iv.map(_._1).min
        val longest = iv.map { case (s, e) => e - s }.max
        covered >= longest && covered <= span && r.getLong(1) == iv.length
      }
    }

  private val groupCounts: Gen[List[String]] =
    Gen.listOfN(80, Gen.oneOf("a", "b", "c", "d", "e", "f"))

  property("largestRemainderQuotas conserves the budget and stays within ±1 of shares") =
    forAll(groupCounts, Gen.choose(1L, 2000L)) { (gs, total) =>
      import spark.implicits._
      gs.nonEmpty ==> {
        val rows = Sampling.largestRemainderQuotas(gs.toDF("g"), col("g"), total)
          .collect().map(r => (r.getLong(1), r.getLong(2)))
        val budgetExact = rows.map(_._2).sum == total
        val n = gs.length.toLong
        // each quota within 1 of the exact proportional share
        val proportional = rows.forall { case (c, q) =>
          val lo = total * c / n
          q >= lo && q <= lo + 1
        }
        budgetExact && proportional
      }
    }

  private val texts: Gen[List[String]] =
    Gen.listOfN(25, Gen.listOf(Gen.oneOf("Ab", "cd!", " ", "EF,", "g7", "\t"))
      .map(_.mkString))

  property("canonicalText is idempotent and case/punct/space-insensitive") =
    forAll(texts) { ts =>
      import spark.implicits._
      ts.isEmpty || {
        val df = ts.toDF("t")
        val once = Dedup.canonicalText(col("t"))
        val twice = Dedup.canonicalText(Dedup.canonicalText(col("t")))
        val idem = df.filter(once =!= twice).count() == 0L
        val insensitive = df.filter(
          Dedup.canonicalText(upper(col("t"))) =!= once ||
            Dedup.canonicalText(regexp_replace(col("t"), " ", "  ")) =!= once).count() == 0L
        idem && insensitive
      }
    }
}
