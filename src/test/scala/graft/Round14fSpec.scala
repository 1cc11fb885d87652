package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

/** Round-14 specs, part 6: strongly connected components — hand case,
  * randomized Tarjan reference check (the Round13c kTruss harness shape),
  * and the q386 ground-truth fixture. */
class Round14fSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical SCC labels (min member) by plain-Scala Tarjan. */
  private def tarjanScc(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val g = edges.groupBy(_._1).map { case (a, es) => a -> es.map(_._2) }
      .withDefaultValue(Seq.empty)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStk = scala.collection.mutable.Set.empty[Long]
    val stk = scala.collection.mutable.Stack.empty[Long]
    var idx = 0
    val out = scala.collection.mutable.Map.empty[Long, Long]
    def strong(v0: Long): Unit = {
      // iterative Tarjan (explicit call stack)
      val call = scala.collection.mutable.Stack[(Long, Iterator[Long])]()
      def push(v: Long): Unit = {
        index(v) = idx; low(v) = idx; idx += 1
        stk.push(v); onStk += v
        call.push((v, g(v).iterator))
      }
      push(v0)
      while (call.nonEmpty) {
        val (v, it) = call.top
        var descended = false
        while (!descended && it.hasNext) {
          val w = it.next()
          if (!index.contains(w)) { push(w); descended = true }
          else if (onStk(w)) low(v) = math.min(low(v), index(w))
        }
        if (!descended) {
          call.pop()
          if (call.nonEmpty) {
            val p = call.top._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.Buffer.empty[Long]
            var w = -1L
            while ({ w = stk.pop(); onStk -= w; comp += w; w != v }) ()
            val label = comp.min
            comp.foreach(m => out(m) = label)
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strong(v))
    out.toMap
  }

  test("SCC: two directed cycles joined one-way stay separate components") {
    // 0→1→2→0 and 5→6→5, bridge 2→5 (no way back)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L), (6L, 5L), (2L, 5L))
      .toDF("src", "dst")
    val got = Graph.stronglyConnectedComponents(edges, maxRounds = 3,
        maxPropRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("SCC ≡ Tarjan on 15 pseudo-random directed graphs") {
    var seed = 8686L
    def next(): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L); (seed >>> 33) }
    (0 until 15).foreach { g =>
      val n = 5 + (next() % 6).toInt
      val edges = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && next() % 100 < 30
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = Graph.stronglyConnectedComponents(
            edges.toDF("src", "dst"), maxRounds = n + 1,
            maxPropRounds = 2 * n + 2)
          .as[(Long, Long)].collect().toMap
        val expected = tarjanScc(n, edges)
        assert(got == expected, s"graph $g (n=$n, |E|=${edges.size})")
      }
    }
  }

  test("q387 condensation: 40 components of 6, even blocks point at their successor") {
    val rows = SparkEntry.queries("q387_scc_condensation")(spark, "unused")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.size == 40)
    (0 until 40).foreach { b =>
      val (_, m, out, in) = rows(b * 6L)
      assert(m == 6L)
      assert(out == (if (b % 2 == 0) 1L else 0L))
      assert(in == (if (b % 2 == 1) 1L else 0L))
    }
  }

  test("q386: all 240 nodes resolved to their 6-node cycle") {
    val got = SparkEntry.queries("q386_scc")(spark, "unused")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 240)
    assert((0L until 240L).forall(i => got(i) == i - i % 6))
  }
}
