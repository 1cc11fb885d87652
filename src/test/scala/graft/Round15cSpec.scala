package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-15 specs, part 3: bridges / 2-edge-connected components — the
  * closed-form fixture, a randomized plain-Scala Tarjan replay, the
  * loud-failure honest bound, and multi-component inputs. */
class Round15cSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Tarjan bridge reference (DFS low-link, the textbook
    * algorithm the distributed covering construction must agree with) —
    * MULTIGRAPH-aware: a duplicated undirected edge is a 2-cycle and is
    * never a bridge (the round-16 contract; randomized trials DO generate
    * duplicate pairs). */
  private def tarjanBridges(n: Int, edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val keyed = edges.map { case (a, b) =>
      (math.min(a, b).toInt, math.max(a, b).toInt) }
      .filter { case (a, b) => a != b }
    val multi = keyed.groupBy(identity).collect {
      case (k, v) if v.size >= 2 => (k._1.toLong, k._2.toLong) }.toSet
    val adj = Array.fill(n)(List.empty[Int])
    val und = keyed.distinct
    und.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val disc = Array.fill(n)(-1)
    val low = Array.fill(n)(0)
    var timer = 0
    val out = scala.collection.mutable.Set[(Long, Long)]()
    def dfs(u: Int, pe: (Int, Int)): Unit = {
      disc(u) = timer; low(u) = timer; timer += 1
      adj(u).foreach { v =>
        if (disc(v) == -1) {
          dfs(v, (u, v))
          low(u) = math.min(low(u), low(v))
          if (low(v) > disc(u))
            out += ((math.min(u, v).toLong, math.max(u, v).toLong))
        } else if ((math.min(u, v), math.max(u, v)) !=
                   (math.min(pe._1, pe._2), math.max(pe._1, pe._2)))
          low(u) = math.min(low(u), disc(v))
      }
    }
    (0 until n).foreach(u => if (disc(u) == -1 && adj(u).nonEmpty) dfs(u, (-1, -1)))
    out.toSet -- multi
  }

  /** 10 five-node cycles chained by single connector edges — connectors
    * are the bridges, cycle edges are not. */
  private def cycleChain: Seq[(Long, Long)] = {
    val cyc = (0 until 10).flatMap { c =>
      (0 until 5).map(i => (c * 10L + i, c * 10L + (i + 1) % 5))
    }
    val conn = (0 until 9).map(c => (c * 10L + 2, (c + 1) * 10L))
    cyc ++ conn
  }

  test("bridges: closed-form cycle-chain fixture") {
    val out = Graph.bridges(cycleChain.toDF("id_a", "id_b"), maxRounds = 40)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 59) // 50 cycle edges + 9 connectors
    val br = out.filter(_._3).map(r => (r._1, r._2)).toSet
    val expect = (0 until 9).map(c => (c * 10L + 2, (c + 1) * 10L)).toSet
    assert(br == expect, s"got $br")
  }

  test("twoEdgeConnectedComponents: cycle-chain collapses to the 10 cycles") {
    val out = Graph.twoEdgeConnectedComponents(
        cycleChain.toDF("id_a", "id_b"), maxRounds = 40)
      .as[(Long, Long)].collect().toMap
    assert(out.size == 50)
    assert(out.forall { case (id, c) => c == (id / 10) * 10 },
      s"every node labels to its cycle's min member: $out")
  }

  test("bridges ≡ Tarjan on 12 pseudo-random graphs (incl. disconnected)") {
    val rng = new scala.util.Random(1517L)
    for (trial <- 1 to 12) {
      val n = 12 + rng.nextInt(40)
      val nEdges = n / 2 + rng.nextInt(2 * n)
      val edges = (0 until nEdges).map { _ =>
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val expect = tarjanBridges(n, edges)
        val got = Graph.bridges(edges.toDF("id_a", "id_b"), maxRounds = 60)
          .as[(Long, Long, Boolean)].collect()
          .filter(_._3).map(r => (r._1, r._2)).toSet
        assert(got == expect,
          s"trial $trial n=$n edges=$edges:\n got $got\n expect $expect")
      }
    }
  }

  test("bridges: undersized maxRounds fails LOUDLY, never partially") {
    // a 40-node path needs ~40 BFS rounds; bound 5 must throw, not return
    // a partial (wrong) bridge set
    val path = (0 until 39).map(i => (i.toLong, i + 1L))
    val ex = intercept[IllegalArgumentException] {
      Graph.bridges(path.toDF("id_a", "id_b"), maxRounds = 5).collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("bridges: multigraph contract — a doubled edge is never a bridge") {
    // path 1-2-3 with (2,3) doubled: (1,2) stays a bridge, (2,3) is a
    // 2-cycle and must NOT be one; output stays one row per distinct edge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    val out = Graph.bridges(edges.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 2L, true), (2L, 3L, false)), s"got $out")
    // and 2ECC sees the doubled edge as 2-edge-connected
    val ecc = Graph.twoEdgeConnectedComponents(
        edges.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(ecc == Map(1L -> 1L, 2L -> 2L, 3L -> 2L), s"got $ecc")
  }

  test("bridges: a tree is all bridges; a clique has none") {
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    val t = Graph.bridges(tree.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long, Boolean)].collect()
    assert(t.length == 5 && t.forall(_._3))
    val k5 = for (i <- 0 until 5; j <- i + 1 until 5)
      yield (i.toLong, j.toLong)
    val c = Graph.bridges(k5.toDF("id_a", "id_b"), maxRounds = 10)
      .as[(Long, Long, Boolean)].collect()
    assert(c.length == 10 && c.forall(!_._3))
  }
}
