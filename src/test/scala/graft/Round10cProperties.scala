package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.{Calibration, Graph, Itemsets, Sessionize, Spatial, Survival}

/** Property sweeps for the round-10c operators: equivalence to naive
  * reference computations on GENERATED inputs (spatial grid vs quadratic,
  * Apriori vs unpruned, fold-sessionization vs one-shot, k-core closure),
  * and the structural laws the analytical ops must satisfy (survival
  * monotonicity and conservation, isotonic monotonicity).
  */
class Round10cProperties extends Properties("Round10cOps") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val points: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      x <- Gen.choose(0L, 120L); y <- Gen.choose(0L, 120L)
    } yield (x, y))

  property("withinRadiusPairs ≡ naive quadratic on random clustered points") =
    forAll(points, Gen.oneOf(7L, 19L, 40L)) { (ps, r) =>
      import spark.implicits._
      val pts = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      val naive = (for {
        (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
        if ia < ib
        d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
        if d2 <= r * r
      } yield (ia, ib, d2)).toSet
      val got = Spatial.withinRadiusPairs(pts.toDF("id", "x", "y"), r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      got == naive
    }

  private val durations: Gen[List[(Long, Int)]] =
    Gen.listOfN(30, for {
      d <- Gen.choose(0L, 12L); ev <- Gen.oneOf(0, 1)
    } yield (d, ev)).map(l => if (l.isEmpty) List((1L, 1)) else l)

  property("kaplanMeier: curve non-increasing, at_risk strictly decreasing, counts conserved") =
    forAll(durations) { durs =>
      import spark.implicits._
      val out = Survival.kaplanMeier(durs.toDF("d", "ev"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      val survs = out.map(_._5)
      val atRisk = out.map(_._2)
      survs.zip(survs.drop(1)).forall { case (a, b) => b <= a } &&
        atRisk.zip(atRisk.drop(1)).forall { case (a, b) => b < a } &&
        out.map(t => t._3 + t._4).sum == durs.size &&
        out.headOption.forall(_._2 == durs.size)
    }

  private val baskets: Gen[List[(Long, Long)]] =
    Gen.listOfN(80, for {
      b <- Gen.choose(0L, 19L); i <- Gen.choose(0L, 9L)
    } yield (b, i))

  property("frequentTriples ≡ naive un-pruned count on random baskets") =
    forAll(baskets, Gen.choose(2L, 3L)) { (bs, sup) =>
      import spark.implicits._
      val naive = bs.distinct.groupBy(_._1).values
        .flatMap(items => items.map(_._2).sorted.combinations(3))
        .toSeq.groupBy(identity)
        .map { case (t, xs) => (t(0), t(1), t(2), xs.size.toLong) }
        .filter(_._4 >= sup).toSet
      val got = Itemsets.frequentTriples(bs.toDF("b", "i"), "b", "i", sup)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      got == naive
    }

  property("kCore (converged): every surviving vertex has degree ≥ k within the survivor set") =
    forAll(baskets, Gen.choose(2L, 3L)) { (bs, k) =>
      import spark.implicits._
      val edges = bs.distinct.filter(e => e._1 != e._2 + 100) // arbitrary shape
        .map { case (a, b) => (a, b + 100L) }
      if (edges.isEmpty) true
      else {
        val out = Graph.kCore(edges.toDF("id_a", "id_b"), k, maxRounds = 30)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val survivors = out.keySet
        // recompute degrees of the induced subgraph naively
        val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
        val induced = sym.filter { case (a, b) => survivors(a) && survivors(b) }
        val deg = induced.groupBy(_._1).map { case (v, es) => (v, es.size.toLong) }
        out.forall { case (v, d) => deg.getOrElse(v, 0L) == d && d >= k }
      }
    }

  private val events: Gen[List[(String, Long)]] =
    Gen.listOfN(40, for {
      u <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 300L)
    } yield (u, t)).map(_.distinct)

  property("mergeSessionState fold ≡ one-shot sessionization for random cut points") =
    forAll(events, Gen.choose(50L, 250L)) { (evs, cut) =>
      import spark.implicits._
      evs.isEmpty || {
        val df = evs.map { case (u, t) => (u, t * 1000000L) }.toDF("user_id", "us")
        def sess(d: org.apache.spark.sql.DataFrame) = Sessionize.sessionSummaries(
            d, col("user_id"), col("us"), gapSeconds = 20L, Seq(col("us")))
          .select(col("user_id"), col("session_start_us"),
            col("session_end_us"), col("n_events"))
        def key(d: org.apache.spark.sql.DataFrame) = d.collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val c = cut * 1000000L
        val b1 = df.where(col("us") <= c); val b2 = df.where(col("us") > c)
        val folded =
          if (evs.forall(_._2 * 1000000L > c)) sess(b2)
          else if (evs.forall(_._2 * 1000000L <= c)) sess(b1)
          else Sessionize.mergeSessionState(sess(b1), sess(b2), gapSeconds = 20L)
        key(folded) == key(sess(df))
      }
    }

  property("isotonicFit is monotone and mass-preserving on random bucket labels") =
    forAll(Gen.listOfN(50, for {
      b <- Gen.choose(0L, 7L); lab <- Gen.oneOf(0, 1)
    } yield (b, lab))) { rows =>
      import spark.implicits._
      rows.isEmpty || {
        val out = Calibration.isotonicFit(rows.toDF("bucket", "label"), "bucket", "label")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1)
        val fits = out.map(_._4)
        fits.zip(fits.drop(1)).forall { case (a, b) => a <= b } &&
          out.map(_._2).sum == rows.size &&
          out.map(_._3).sum == rows.count(_._2 == 1) &&
          fits.forall(f => f >= 0L && f <= 1000000L)
      }
    }
}
