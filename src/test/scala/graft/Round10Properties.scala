package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.{Dedup, Graph, Sampling, TimeSeries}

/** Property sweeps for the round-10 operators: conservation laws
  * (proration over signed amounts, raking mass), endpoint exactness of
  * interpolation, range bounds of the audit/quality statistics.
  */
class Round10Properties extends Properties("Round10Ops") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val signedAmounts: Gen[List[Long]] =
    Gen.listOfN(40, Gen.choose(-100000L, 100000L))

  property("prorateOverMonths conserves Σamounts exactly for ANY sign mix") =
    forAll(signedAmounts, Gen.choose(1, 12)) { (amts, periods) =>
      import spark.implicits._
      val df = amts.map((_, "2026-03-10")).toDF("amt", "d")
        .withColumn("d", to_date(col("d")))
      val total = TimeSeries.prorateOverMonths(df, col("amt"), col("d"), periods)
        .agg(sum("recognized_cents")).head().getLong(0)
      amts.isEmpty || total == amts.sum
    }

  private val series: Gen[List[(Int, Long)]] =
    Gen.listOfN(12, for {
      day <- Gen.choose(0, 60)
      v <- Gen.choose(-5000L, 5000L)
    } yield (day, v)).map(_.groupBy(_._1).map { case (d, vs) => (d, vs.head._2) }.toList)

  property("linearInterpolateDaily keeps every observed point bit-exact and fills every gap day") =
    forAll(series) { pts =>
      import spark.implicits._
      pts.isEmpty || {
        val df = pts.map { case (d, v) => (1L, java.sql.Date.valueOf(
          java.time.LocalDate.of(2026, 1, 1).plusDays(d)), v) }.toDF("k", "d", "y")
        val out = TimeSeries.linearInterpolateDaily(df, "k", col("d"), col("y"))
          .collect().map(r => (r.getDate(1).toLocalDate, r.getLong(2), r.getBoolean(3)))
        val byDay = out.map(x => x._1 -> x).toMap
        val observed = pts.map { case (d, v) =>
          (java.time.LocalDate.of(2026, 1, 1).plusDays(d), v) }.toMap
        val lo = observed.keys.min; val hi = observed.keys.max
        val allDays = Iterator.iterate(lo)(_.plusDays(1)).takeWhile(!_.isAfter(hi)).toSeq
        allDays.forall(d => byDay.contains(d)) &&
          observed.forall { case (d, v) =>
            byDay(d)._2 == v && !byDay(d)._3 } &&
          out.length == allDays.size
      }
    }

  private val pairSets: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    t <- Gen.listOfN(20, Gen.zip(Gen.choose(0L, 15L), Gen.choose(16L, 30L)))
    f <- Gen.listOfN(20, Gen.zip(Gen.choose(0L, 15L), Gen.choose(16L, 30L)))
  } yield (t, f)

  property("recallAudit: 0 ≤ hit ≤ min(true, found) and recall ∈ [0, 1000]") =
    forAll(pairSets) { case (t, f) =>
      import spark.implicits._
      val r = Dedup.recallAudit(t.toDF("id_a", "id_b"), f.toDF("id_a", "id_b"),
        Seq("id_a", "id_b")).collect().head
      val (nt, nf, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      nh >= 0 && nh <= math.min(nt, nf) && r.getLong(3) == nt - nh &&
        (if (nt == 0) r.isNullAt(4)
         else r.getLong(4) >= 0 && r.getLong(4) <= 1000)
    }

  private val graphs: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(0L, 12L), Gen.choose(0L, 12L)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)

  property("modularityMicro of the connected-component partition lies in (-10^6, 10^6]") =
    forAll(graphs) { edges =>
      import spark.implicits._
      edges.isEmpty || {
        val e = edges.toDF("id_a", "id_b")
        val labels = Graph.connectedComponents(e).withColumnRenamed("component", "label")
        val r = Graph.modularityMicro(e, labels, nodeCol = "id", labelCol = "label")
          .collect().head
        val q = r.getLong(3)
        // CC partition has no cut edges: every edge intra ⇒ Q ≥ 0 too
        r.getLong(2) == r.getLong(0) && q >= 0 && q <= 1000000L
      }
    }

  private val cellRows: Gen[List[(String, String)]] =
    Gen.listOfN(80, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.oneOf("x", "y")))

  property("rakeWeights conserves positive weights and moves marginals toward targets") =
    forAll(cellRows) { rows =>
      import spark.implicits._
      val levelsR = rows.map(_._1).distinct
      val levelsC = rows.map(_._2).distinct
      (levelsR.size < 3 || levelsC.size < 2) || {
        val out = Sampling.rakeWeights(rows.toDF("r", "c"), col("r"), col("c"),
          Seq("a" -> 400L, "b" -> 350L, "c" -> 250L),
          Seq("x" -> 600L, "y" -> 400L), iters = 2).collect()
        val n = rows.size.toLong
        // weights positive; column marginals (last-fitted axis) within 1%
        out.forall(_.getLong(3) > 0) && {
          val xMass = out.filter(_.getString(1) == "x")
            .map(r => r.getLong(2) * r.getLong(3)).sum
          math.abs(xMass - 600L * n) <= math.max(600L * n / 50, 2000L)
        }
      }
    }
}
