package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-14 specs, part 2: multi-level Louvain — the hand-checkable
  * two-triangle graph, the per-level modularity monotone guard, and a
  * randomized plain-Scala reference replay of the full semantics
  * (weighted guarded min-label sweeps + contraction). */
class Round14bSpec extends SparkSpec {
  import spark.implicits._

  test("louvainMultiLevel: two bridged triangles resolve to the two triangles, stable at level 2") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L), (2L, 10L)).toDF("id_a", "id_b")
    val rows = Graph.louvainMultiLevel(edges, sweepsPerLevel = 2, levels = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // hand-computed (2m = 14): two min-label sweeps leave 3 communities —
    // {0,1,2}, {10,11}, {12} — with 4 internal edges and Q·(2m)² = 34;
    // CONTRACTION then lets level 2 finish the job the synchronized
    // sweeps could not: on the 3-node weighted graph {12} merges into
    // {10,11}, giving exactly the two triangles (6 internal edges,
    // Q·(2m)² = 2·14·6 − (7² + 7²) = 70). Merging the two triangles
    // themselves has gain 14 − 49 < 0, so the partition is final — the
    // "detects more than one level of structure" property in miniature.
    assert(rows(0) == ((1L, 6L, 3L, 4L, 34L)), s"level 1 was ${rows(0)}")
    assert(rows(1) == ((2L, 3L, 2L, 6L, 70L)), s"level 2 was ${rows(1)}")
  }

  /** Plain-Scala replay of louvainMultiLevel's exact semantics. */
  private def refMultiLevel(edges: Seq[(Long, Long)], sweeps: Int,
                            levels: Int): Seq[(Long, Long, Long, Long, Long)] = {
    var wed: Map[(Long, Long), Long] = edges
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct.map(_ -> 1L).toMap
    var out = List.empty[(Long, Long, Long, Long, Long)]
    for (lvl <- 1 to levels) {
      val nodes = wed.keys.flatMap(e => Seq(e._1, e._2)).toSet
      val degM = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      wed.foreach { case ((a, b), w) =>
        if (a == b) degM(a) += 2 * w else { degM(a) += w; degM(b) += w }
      }
      val deg = nodes.map(n => n -> degM(n)).toMap
      val m2 = deg.values.sum
      def qOf(l: Map[Long, Long]): Long = {
        val win = wed.collect { case ((a, b), w) if a == b || l(a) == l(b) => w }.sum
        // .iterator: mapping a key SET through deg would dedup equal degrees
        val tot2 = l.groupBy(_._2).values
          .map(ms => { val t = ms.keys.iterator.map(deg).sum; t * t }).sum
        2 * m2 * win - tot2
      }
      var lab: Map[Long, Long] = nodes.map(n => n -> n).toMap
      for (_ <- 1 to sweeps) {
        val totC = lab.groupBy(_._2)
          .map { case (c, ms) => c -> ms.keys.iterator.map(deg).sum }
        val nbr = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
        wed.foreach { case ((a, b), w) =>
          if (a != b) { nbr((a, lab(b))) += w; nbr((b, lab(a))) += w }
        }
        val prop = lab.map { case (n, c) =>
          val cands = nbr.keys.collect { case (nn, cd) if nn == n && cd < c =>
            (deg(n) * (totC(cd) - totC(c) + deg(n))
              - m2 * (nbr((n, cd)) - nbr((n, c))), cd)
          }.toSeq.sorted
          n -> (if (cands.nonEmpty && cands.head._1 < 0) cands.head._2 else c)
        }
        if (qOf(prop) > qOf(lab)) lab = prop
      }
      val win = wed.collect { case ((a, b), w) if a == b || lab(a) == lab(b) => w }.sum
      out :+= ((lvl.toLong, nodes.size.toLong, lab.values.toSet.size.toLong,
        win, qOf(lab)))
      wed = wed.groupBy { case ((a, b), _) =>
        (math.min(lab(a), lab(b)), math.max(lab(a), lab(b)))
      }.map { case (k, vs) => k -> vs.values.sum }
    }
    out
  }

  test("skipGramPmi: hand-computed pairs, marginals, and PMI rationals on a 2-walk corpus") {
    // walk 0: 1 2 3 ; walk 1: 2 3  — window 1 → ordered adjacent pairs:
    // (1,2),(2,1),(2,3),(3,2) from walk 0; (2,3),(3,2) from walk 1.
    val walks = Seq((0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 3L),
      (1L, 0L, 2L), (1L, 1L, 3L)).toDF("walk_id", "step", "node")
    val rows = Graph.skipGramPmi(walks, window = 1)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rows.size == 4)
    // n_total = 6; centers: 1→1, 2→3, 3→2; contexts mirror by symmetry
    val (_, _, np, ncen, nctx, ntot, num, den) = rows((2L, 3L))
    assert((np, ncen, nctx, ntot) == ((2L, 3L, 2L, 6L)))
    assert(num == 2L * 6L && den == 3L * 2L)
    assert(rows((1L, 2L))._3 == 1L && rows((1L, 2L))._4 == 1L)
    // symmetry of the emission: (x,y) and (y,x) have equal n_pairs
    assert(rows((2L, 3L))._3 == rows((3L, 2L))._3)
    assert(rows((1L, 2L))._3 == rows((2L, 1L))._3)
    // window 2 adds the distance-2 pairs: (1,3),(3,1) from walk 0
    val w2 = Graph.skipGramPmi(walks, window = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(w2.length == 6 && w2.map(_._6).distinct.toSeq == Seq(8L))
  }

  test("louvainMultiLevel ≡ plain-Scala reference on 15 pseudo-random graphs") {
    var seed = 1414L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    (0 until 15).foreach { g =>
      val n = 5 + (next() % 8).toInt
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if next() % 100 < 40
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = Graph
          .louvainMultiLevel(edges.toDF("id_a", "id_b"), sweepsPerLevel = 2,
            levels = 2)
          .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
        val expected = refMultiLevel(edges, sweeps = 2, levels = 2)
        assert(got == expected, s"graph $g (n=$n, |E|=${edges.size})")
        // the guard's contract: per-level modularity never decreases
        assert(got(1)._5 >= got(0)._5,
          s"graph $g: level-2 Q ${got(1)._5} < level-1 Q ${got(0)._5}")
      }
    }
  }
}
