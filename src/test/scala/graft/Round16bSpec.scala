package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-16 specs, part 2: biconnected components + articulation points —
  * closed-form fixtures, a randomized plain-Scala Hopcroft–Tarjan block
  * replay, multigraph semantics, and the loud honest bound. */
class Round16bSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Hopcroft–Tarjan biconnected components (DFS low-link +
    * edge stack) — blocks as edge-set partitions plus the articulation
    * set. Parallel/duplicate input edges collapse to the distinct simple
    * graph: a doubled edge's 2-cycle contains no other edge, so the
    * distinct-edge block partition and the cut vertices are unchanged. */
  private def tarjanBcc(n: Int, edgesIn: Seq[(Long, Long)])
      : (Set[Set[(Long, Long)]], Set[Long]) = {
    val und = edgesIn.map { case (x, y) =>
      (math.min(x, y).toInt, math.max(x, y).toInt) }
      .filter { case (x, y) => x != y }.distinct
    val adj = Array.fill(n)(List.empty[(Int, Int)])
    und.zipWithIndex.foreach { case ((x, y), i) =>
      adj(x) = (y, i) :: adj(x); adj(y) = (x, i) :: adj(y)
    }
    val disc = Array.fill(n)(-1)
    val low = Array.fill(n)(0)
    var timer = 0
    val stack = scala.collection.mutable.Stack[Int]()
    val blocks = scala.collection.mutable.Set[Set[(Long, Long)]]()
    val artic = scala.collection.mutable.Set[Long]()
    def edgeOf(i: Int): (Long, Long) = (und(i)._1.toLong, und(i)._2.toLong)
    def dfs(u: Int, peIdx: Int): Unit = {
      disc(u) = timer; low(u) = timer; timer += 1
      var children = 0
      adj(u).foreach { case (v, ei) =>
        if (disc(v) == -1) {
          children += 1
          stack.push(ei)
          dfs(v, ei)
          low(u) = math.min(low(u), low(v))
          if (low(v) >= disc(u)) {
            val blk = scala.collection.mutable.Set[Int]()
            var top = -1
            do { top = stack.pop(); blk += top } while (top != ei)
            blocks += blk.map(edgeOf).toSet
            if (peIdx != -1) artic += u.toLong
          }
        } else if (ei != peIdx && disc(v) < disc(u)) {
          stack.push(ei)
          low(u) = math.min(low(u), disc(v))
        }
      }
      if (peIdx == -1 && children >= 2) artic += u.toLong
    }
    (0 until n).foreach(u => if (disc(u) == -1 && adj(u).nonEmpty) dfs(u, -1))
    (blocks.toSet, artic.toSet)
  }

  private def cycleChain: Seq[(Long, Long)] = {
    val cyc = (0 until 10).flatMap { c =>
      (0 until 5).map(i => (c * 10L + i, c * 10L + (i + 1) % 5))
    }
    val conn = (0 until 9).map(c => (c * 10L + 2, (c + 1) * 10L))
    cyc ++ conn
  }

  test("biconnectedLabels: closed-form cycle-chain fixture") {
    val out = Graph.biconnectedLabels(cycleChain.toDF("id_a", "id_b"),
        maxRounds = 40)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length == 59)
    out.foreach { case (a, b, ba, bb) =>
      // connector (c*10+2, (c+1)*10) is its own block; cycle c's smallest
      // edge is (c*10, c*10+1)
      val expect =
        if (b - a == 8L) (a, b)
        else ((a / 10) * 10, (a / 10) * 10 + 1)
      assert((ba, bb) == expect,
        s"edge ($a,$b): got block ($ba,$bb), expect $expect")
    }
  }

  test("articulationPoints: closed-form cycle-chain fixture") {
    val out = Graph.articulationPoints(cycleChain.toDF("id_a", "id_b"),
        maxRounds = 40)
      .as[(Long, Boolean)].collect().toMap
    assert(out.size == 50)
    out.foreach { case (id, art) =>
      val expect = (id % 10 == 2 && id < 90) || (id % 10 == 0 && id >= 10)
      assert(art == expect, s"node $id: got $art, expect $expect")
    }
  }

  test("blocks + articulation ≡ Hopcroft–Tarjan on 12 pseudo-random graphs") {
    val rng = new scala.util.Random(1613L)
    for (trial <- 1 to 12) {
      val n = 12 + rng.nextInt(40)
      val nEdges = n / 2 + rng.nextInt(2 * n)
      val edges = (0 until nEdges).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val (expBlocks, expArtic) = tarjanBcc(n, edges)
        val bl = Graph.biconnectedLabels(edges.toDF("id_a", "id_b"),
            maxRounds = 60)
          .as[(Long, Long, Long, Long)].collect()
        val gotBlocks = bl.groupBy(e => (e._3, e._4))
          .map { case (_, es) => es.map(e => (e._1, e._2)).toSet }.toSet
        assert(gotBlocks == expBlocks,
          s"trial $trial n=$n edges=$edges:\n got $gotBlocks\n expect $expBlocks")
        // canonical label = the block's lexicographically smallest edge
        bl.groupBy(e => (e._3, e._4)).foreach { case (blk, es) =>
          assert(blk == es.map(e => (e._1, e._2)).min,
            s"trial $trial: label $blk not the min edge")
        }
        val gotArtic = Graph.articulationPoints(edges.toDF("id_a", "id_b"),
            maxRounds = 60)
          .as[(Long, Boolean)].collect().filter(_._2).map(_._1).toSet
        assert(gotArtic == expArtic,
          s"trial $trial n=$n edges=$edges:\n got $gotArtic\n expect $expArtic")
      }
    }
  }

  test("K5 is one block with no articulation; a star cuts at the hub") {
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5) yield (i.toLong, j.toLong)
    val blK5 = Graph.biconnectedLabels(k5.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(blK5.length == 10 && blK5.forall(e => (e._3, e._4) == ((0L, 1L))))
    val artK5 = Graph.articulationPoints(k5.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Boolean)].collect()
    assert(artK5.length == 5 && artK5.forall(!_._2))
    val star = (1 to 4).map(i => (0L, i.toLong))
    val artStar = Graph.articulationPoints(star.toDF("id_a", "id_b"),
        maxRounds = 10)
      .as[(Long, Boolean)].collect().toMap
    assert(artStar == Map(0L -> true, 1L -> false, 2L -> false,
      3L -> false, 4L -> false))
  }

  test("multigraph: a doubled edge changes neither blocks nor cut vertices") {
    // path 1-2-3 with (2,3) doubled: blocks {12}, {23}; node 2 cuts
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    val bl = Graph.biconnectedLabels(edges.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(bl == Set((1L, 2L, 1L, 2L), (2L, 3L, 2L, 3L)), s"got $bl")
    val art = Graph.articulationPoints(edges.toDF("id_a", "id_b"),
        maxRounds = 10)
      .as[(Long, Boolean)].collect().toMap
    assert(art == Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("biconnectedLabels: undersized maxRounds fails LOUDLY") {
    val path = (0 until 39).map(i => (i.toLong, i + 1L))
    val ex = intercept[IllegalArgumentException] {
      Graph.biconnectedLabels(path.toDF("id_a", "id_b"), maxRounds = 5)
        .collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
  }
}
