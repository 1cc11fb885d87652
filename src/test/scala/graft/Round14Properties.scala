package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classify, Dedup, Graph}

/** Round-14 randomized reference checks (the Round13c kTruss harness
  * shape): Naive Bayes model + predictions, skip-gram PMI rationals, and
  * capped keep-first substring dedup, each replayed in plain Scala on
  * LCG-generated inputs. */
class Round14Properties extends SparkSpec {
  import spark.implicits._

  private var seed = 0L
  private def next(): Long = {
    seed = seed * 6364136223846793005L + 1442695040888963407L; seed >>> 33
  }

  test("naiveBayes model + predict ≡ plain-Scala reference on 10 random corpora") {
    seed = 77L
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (0 until 10).foreach { g =>
      val nTrain = 6 + (next() % 6).toInt
      val labels = Vector("x", "y", "z")
      def doc(): String =
        (0 until (3 + (next() % 8)).toInt).map(_ => vocab((next() % 6).toInt))
          .mkString(" ")
      val train = (0 until nTrain).map(i =>
        (i.toLong, labels((next() % 3).toInt), doc()))
      val test = (0 until 5).map(i => (100L + i, doc()))

      // reference model
      val cnt = scala.collection.mutable.Map.empty[(String, String), Long]
      val tot = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      train.foreach { case (_, l, t) =>
        t.split("\\s+").foreach { w =>
          cnt((l, w)) = cnt.getOrElse((l, w), 0L) + 1; tot(l) += 1
        }
      }
      val v = cnt.keys.map(_._2).toSet.size
      def w(c: Long, l: String): Long =
        math.round(1e6 * math.log((c + 1) * 1.0 / (tot(l) + v)))
      val refModel = cnt.map { case ((l, t), c) => (l, t, c, w(c, l)) }.toSet
      val gotModel = Classify.naiveBayesModel(train.toDF("doc_id", "label", "text"))
        .as[(String, String, Long, Long)].collect().toSet
      assert(gotModel == refModel, s"corpus $g model")

      // reference predictions
      val nd = train.groupBy(_._2).map { case (l, ds) => l -> ds.size.toLong }
      val n = train.size.toLong
      def prior(l: String) = math.round(1e6 * math.log(nd(l) * 1.0 / n))
      def unseen(l: String) = math.round(1e6 * math.log(1.0 / (tot(l) + v)))
      val inVocab = cnt.keys.map(_._2).toSet
      val refPred = test.flatMap { case (id, t) =>
        val toks = t.split("\\s+").filter(inVocab)
        if (toks.isEmpty) None
        else {
          val scored = nd.keys.toSeq.sorted.map { l =>
            (prior(l) + toks.map(tk =>
              cnt.get((l, tk)).map(w(_, l)).getOrElse(unseen(l))).sum, l)
          }
          // argmax with tie to the smaller label: sort by (-score, label)
          val (s0, l0) = scored.sortBy { case (s, l) => (-s, l) }.head
          Some((id, l0, s0))
        }
      }.toSet
      val gotPred = Classify.naiveBayesPredict(
          train.toDF("doc_id", "label", "text"), test.toDF("doc_id", "text"))
        .as[(Long, String, Long)].collect().toSet
      assert(gotPred == refPred, s"corpus $g predictions")
    }
  }

  test("skipGramPmi ≡ plain-Scala reference on 10 random walk tables") {
    seed = 909L
    (0 until 10).foreach { g =>
      val nWalks = 2 + (next() % 4).toInt
      val rows = (0 until nWalks).flatMap { wlk =>
        val len = 2 + (next() % 5).toInt
        (0 until len).map(st => (wlk.toLong, st.toLong, (next() % 6).toLong))
      }
      val win = 1 + (next() % 2).toInt
      val pc = scala.collection.mutable.Map.empty[(Long, Long), Long]
      for {
        (w1, s1, n1) <- rows; (w2, s2, n2) <- rows
        if w1 == w2 && math.abs(s1 - s2) >= 1 && math.abs(s1 - s2) <= win
      } pc((n1, n2)) = pc.getOrElse((n1, n2), 0L) + 1
      val mc = pc.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
      val mx = pc.groupBy(_._1._2).map { case (c, m) => c -> m.values.sum }
      val nt = pc.values.sum
      val ref = pc.map { case ((a, b), np) =>
        (a, b, np, mc(a), mx(b), nt, np * nt, mc(a) * mx(b))
      }.toSet
      val got = Graph.skipGramPmi(rows.toDF("walk_id", "step", "node"), win)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == ref, s"walks $g (win=$win, rows=${rows.size})")
    }
  }

  test("capped keep-first substring dedup ≡ naive reference on 10 random corpora") {
    seed = 515L
    (0 until 10).foreach { g =>
      val minLen = 4
      val cap = 2L + next() % 3
      val docs = (0 until (4 + (next() % 4)).toInt).map { i =>
        // short alphabet → plenty of window collisions at length 4
        (i.toLong, (0 until (8 + (next() % 10)).toInt)
          .map(_ => ('a' + (next() % 3).toInt).toChar).mkString)
      }
      // naive reference: all windows, hash-group cap (string groups — the
      // md5-60 hash is injective on these tiny sets), keep-first rank
      val wins = docs.flatMap { case (d, t) =>
        (1 to t.length - minLen + 1).map(p =>
          (d, p.toLong, t.substring(p - 1, p - 1 + minLen)))
      }
      val grpN = wins.groupBy(_._3).map { case (s, o) => s -> o.size.toLong }
      val kept = wins.filter(w => grpN(w._3) <= cap)
      val covered = kept.groupBy(_._3).values.flatMap { occ =>
        occ.sortBy(o => (o._1, o._2)).drop(1)
      }.map(o => (o._1, o._2)).toSet
      // gaps-and-islands merge per doc
      val refSpans = covered.groupBy(_._1).flatMap { case (d, ps) =>
        val sorted = ps.map(_._2).toSeq.sorted
        val islands = sorted.foldLeft(List.empty[List[Long]]) {
          case (acc, p) => acc match {
            case h :: t if p - h.head <= minLen => (p :: h) :: t
            case _ => List(p) :: acc
          }
        }
        islands.map(is => (d, is.min, is.max + minLen - 1))
      }.toSet
      val got = Dedup.duplicateSubstringSpansKeepFirstCapped(
          docs.toDF("doc_id", "text"), minLen = minLen, maxOccurrences = cap)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == refSpans, s"corpus $g (cap=$cap): $got vs $refSpans")
      // audit rows are exactly the over-cap groups
      val refAudit = grpN.values.count(_ > cap)
      val gotAudit = Dedup.substringHubAudit(
          docs.toDF("doc_id", "text"), minLen = minLen, maxOccurrences = cap)
        .count()
      assert(gotAudit == refAudit.toLong, s"corpus $g audit count")
    }
  }
}
