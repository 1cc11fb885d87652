package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classify, Graph}

/** Round-15 specs, part 1: the SCC honest-bound contract (undersized
  * propagation bounds must yield ABSENT rows, never wrong labels — the
  * round-14 advice item), the frontier-limited forward coloring staying
  * exact, the Louvain empty-input guard, and the size-gated contraction
  * join producing identical output on both sides of the gate. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  /** 30-cycle with 0→i shortcuts: ONE SCC of all 30 nodes. Forward
    * min-label coloring converges in one round (0 reaches every node
    * directly), but the backward frontier from pivot 0 walks the cycle's
    * in-edges one node per round — 30 rounds to drain. */
  private def shortcutCycle = {
    val path = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
    val shortcuts = (2 until 30).map(i => (0L, i.toLong))
    (path ++ shortcuts).toDF("src", "dst")
  }

  test("scc honest bound: backward bound hit emits NOTHING, not a partial SCC") {
    // maxPropRounds=5: forward converges, backward is still growing at 5.
    // Pre-fix behavior emitted marked = {0, 29, 28, 27, 26, 25} as scc 0 and
    // relabeled the remainder next round — one true SCC under two labels.
    val out = Graph.stronglyConnectedComponents(shortcutCycle,
      maxRounds = 4, maxPropRounds = 5).collect()
    assert(out.isEmpty,
      s"an undersized backward bound must surface as missing rows, got ${out.toSeq}")
  }

  test("scc honest bound: forward bound hit emits NOTHING") {
    // plain 30-cycle: forward min-label needs ~30 rounds; at 4 it is still
    // moving, so no class may be emitted (a non-fixed-point coloring can
    // hold two would-be pivots in one true SCC).
    val cyc = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
      .toDF("src", "dst")
    val out = Graph.stronglyConnectedComponents(cyc,
      maxRounds = 4, maxPropRounds = 4).collect()
    assert(out.isEmpty, s"got ${out.toSeq}")
  }

  test("scc: generous bounds on the same fixtures resolve every node exactly") {
    val a = Graph.stronglyConnectedComponents(shortcutCycle,
      maxRounds = 3, maxPropRounds = 40)
      .as[(Long, Long)].collect().toMap
    assert(a.size == 30 && a.values.forall(_ == 0L),
      "the shortcut cycle is one SCC with canonical min-member label 0")
    val cyc = (0 until 30).map(i => (i.toLong, ((i + 1) % 30).toLong))
      .toDF("src", "dst")
    val b = Graph.stronglyConnectedComponents(cyc,
      maxRounds = 3, maxPropRounds = 40)
      .as[(Long, Long)].collect().toMap
    assert(b.size == 30 && b.values.forall(_ == 0L))
  }

  test("scc frontier-limited coloring: cycle + DAG tail stays exact") {
    // a 12-cycle feeding a 6-node path (DAG tail): cycle is one SCC, every
    // path node a singleton SCC peeled one per outer round (condensation
    // depth); the frontier shrinks to the moving boundary after round 1
    // (the correctness half of the perf claim).
    val cyc = (0 until 12).map(i => (i.toLong, ((i + 1) % 12).toLong))
    val tail = (0 until 6).map(i =>
      (if (i == 0) 5L else 99L + i, 100L + i.toLong))
    val out = Graph.stronglyConnectedComponents(
        (cyc ++ tail).toDF("src", "dst"), maxRounds = 8, maxPropRounds = 40)
      .as[(Long, Long)].collect().toMap
    assert((0 until 12).forall(i => out(i.toLong) == 0L))
    assert((0 until 6).forall(i => out(100L + i) == 100L + i),
      "every DAG-tail node is its own SCC")
  }

  test("sccColorStep: candidates come from the FRONTIER's out-edges only") {
    // colors: node 5 sits at a stale-high color with in-neighbor 0 at
    // color 0. With 0 absent from the frontier, 5 must NOT improve (the
    // full-table form would have improved it — this is the pin that the
    // step reads the frontier, not the color table); with 0 in the
    // frontier, it must.
    val e = Seq((0L, 5L), (9L, 6L)).toDF("src", "dst")
    val colors = Seq((0L, 0L), (5L, 5L), (6L, 6L), (9L, 2L))
      .toDF("id", "c")
    val frontNo = Seq((9L, 2L)).toDF("id", "c")
    val noImprove = Graph.sccColorStep(e, colors, frontNo)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(noImprove(5L) == ((5L, false)),
      "node 5's only in-neighbor is outside the frontier — it must not move")
    assert(noImprove(6L) == ((2L, true)), "frontier out-edge must propagate")
    val frontYes = Seq((0L, 0L)).toDF("id", "c")
    val improve = Graph.sccColorStep(e, colors, frontYes)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(improve(5L) == ((0L, true)))
    assert(improve(6L) == ((6L, false)))
  }

  test("louvainMultiLevel: edge-free input returns a clean empty summary") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Graph.louvainMultiLevel(empty, sweepsPerLevel = 1, levels = 2)
    assert(out.columns.toSeq ==
      Seq("level", "n_nodes", "n_communities", "internal_weight", "q_scaled"))
    assert(out.count() == 0L)
    // self-loops-only input degenerates the same way (a = b filtered at init)
    val selfOnly = Seq((3L, 3L), (7L, 7L)).toDF("id_a", "id_b")
    assert(Graph.louvainMultiLevel(selfOnly, 1, 1).count() == 0L)
  }

  test("louvainContract: shuffle path (gate forced off) equals broadcast path") {
    val wed = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 10L, 1L),
      (10L, 11L, 2L), (10L, 10L, 3L)).toDF("a", "b", "w")
    val lab = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("node", "comm")
    val viaBroadcast = Graph.louvainContract(wed, lab)
      .as[(Long, Long, Long)].collect().toSet
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Graph.louvainContract(wed, lab, broadcastLabelLimit = 0L)
      val p = shuffled.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"limit 0 must take the node-keyed equi-join path:\n$p")
      assert(shuffled.as[(Long, Long, Long)].collect().toSet == viaBroadcast,
        "the gate is a join-strategy choice — output must be identical")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q387 fixture unchanged by the size-gated condensation lookup") {
    val rows = SparkEntry.queries("q387_scc_condensation")(spark, "")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 40 && rows.forall(_._2 == 6L))
  }

  test("naiveBayes floor: minCount=1/maxVocab=0 is byte-identical to the default") {
    val corpus = Seq(
      (0L, "a", "red blue red cat"), (1L, "a", "blue blue cat"),
      (2L, "b", "green yellow cat"), (3L, "b", "yellow green green cat"))
      .toDF("doc_id", "label", "text")
    val base = Classify.naiveBayesModel(corpus)
    val floored = Classify.naiveBayesModel(corpus, minCount = 1L, maxVocab = 0)
    assert(base.as[(String, String, Long, Long)].collect().toSet ==
      floored.as[(String, String, Long, Long)].collect().toSet)
    // the no-op floor short-circuits: no extra aggregate or semi-join stage
    // (exprIds differ between instances, so compare plan SHAPE, not text)
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("HashAggregate".r.findAllIn(p).size, "Join".r.findAllIn(p).size)
    }
    assert(shape(base) == shape(floored))
  }

  test("naiveBayes floor: minCount drops exactly the under-floor terms and re-bases V and totals") {
    // term corpus-wide totals: red 2, blue 3, cat 4, green 3, yellow 2,
    // uniq 1 (only once, class a)
    val corpus = Seq(
      (0L, "a", "red blue red cat uniq"), (1L, "a", "blue blue cat"),
      (2L, "b", "green yellow cat"), (3L, "b", "yellow green green cat"))
      .toDF("doc_id", "label", "text")
    val m = Classify.naiveBayesModel(corpus, minCount = 2L)
      .as[(String, String, Long, Long)].collect()
    assert(!m.exists(_._2 == "uniq"), "a singleton-total term is pruned")
    // class a floored total: 2+3+2 = 7 (uniq removed); V = 5 floored terms
    def w(cnt: Long, tot: Long, v: Long): Long =
      math.round(1e6 * math.log((cnt + 1) * 1.0 / (tot + v)))
    val byKey = m.map(r => (r._1, r._2) -> r._4).toMap
    assert(byKey(("a", "red")) == w(2, 7, 5),
      "weights must be computed over the FLOORED totals and vocabulary")
    assert(byKey(("b", "green")) == w(3, 7, 5))
  }

  test("naiveBayes floor: maxVocab keeps the top-N by (total desc, term asc)") {
    val corpus = Seq(
      (0L, "a", "red blue red cat uniq"), (1L, "a", "blue blue cat"),
      (2L, "b", "green yellow cat"), (3L, "b", "yellow green green cat"))
      .toDF("doc_id", "label", "text")
    // totals: cat 4, blue 3, green 3, red 2, yellow 2, uniq 1.
    // maxVocab=3 keeps cat, blue, green (tie blue/green at 3 → both in;
    // tie red/yellow at 2 → cut by rank).
    val kept = Classify.naiveBayesModel(corpus, minCount = 1L, maxVocab = 3)
      .select(col("term")).distinct().as[String].collect().toSet
    assert(kept == Set("cat", "blue", "green"), s"got $kept")
  }

  test("naiveBayes floor: prediction stays consistent — floored-away terms are OOV at scoring") {
    val corpus = Seq(
      (0L, "a", "red blue red cat uniq"), (1L, "a", "blue blue cat"),
      (2L, "b", "green yellow cat"), (3L, "b", "yellow green green cat"))
      .toDF("doc_id", "label", "text")
    val toScore = Seq((10L, "uniq uniq uniq"), (11L, "red blue"))
      .toDF("doc_id", "text")
    val p = Classify.naiveBayesPredict(corpus, toScore, minCount = 2L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(!p.contains(10L),
      "a doc made only of floored-away terms is all-OOV and must be absent")
    assert(p(11L) == "a")
  }

  test("sppmiTopKContexts: plain-Scala replay on a hand walk corpus") {
    import graft.plans.GroupedTopKStrategy
    if (!spark.experimental.extraStrategies.exists(_ eq GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val walks = Seq(
      (0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 3L), (0L, 3L, 1L),
      (1L, 0L, 2L), (1L, 1L, 1L), (1L, 2L, 4L),
      (2L, 0L, 4L), (2L, 1L, 4L), (2L, 2L, 5L))
      .toDF("walk_id", "step", "node")
    val pmi = Graph.skipGramPmi(walks, window = 2)
    val got = Graph.sppmiTopKContexts(pmi, shift = 1L, k = 2)
      .select(col("center"), col("context"), col("pmi_ratio_micros"))
      .as[(Long, Long, Long)].collect().toSet
    // plain-Scala replay
    val seqs = Seq(Seq(1L, 2L, 3L, 1L), Seq(2L, 1L, 4L), Seq(4L, 4L, 5L))
    val pairs = seqs.flatMap { sq =>
      for {
        i <- sq.indices; j <- sq.indices
        if i != j && math.abs(i - j) <= 2
      } yield (sq(i), sq(j))
    }
    val nPairs = pairs.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val nC = pairs.groupBy(_._1).map { case (k2, v) => k2 -> v.size.toLong }
    val nX = pairs.groupBy(_._2).map { case (k2, v) => k2 -> v.size.toLong }
    val nT = pairs.size.toLong
    val expect = nPairs.toSeq
      .map { case ((c, x), n) =>
        (c, x, n * nT, nC(c) * nX(x)) }
      .filter { case (_, _, num, den) => num > den } // shift = 1
      .map { case (c, x, num, den) => (c, x, num * 1000000L / den) }
      .groupBy(_._1)
      .flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, -r._2)).take(2) }
      .toSet
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("sppmiTopKContexts: plans through GroupedTopKExec, not a window sort") {
    import graft.plans.GroupedTopKStrategy
    if (!spark.experimental.extraStrategies.exists(_ eq GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val walks = Seq((0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 3L))
      .toDF("walk_id", "step", "node")
    val p = Graph.sppmiTopKContexts(Graph.skipGramPmi(walks, 2), 1L, 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("GroupedTopK"),
      s"top-k must run through the custom physical operator:\n$p")
    assert(!p.contains("Window"),
      s"a row_number window would sort every center's full context list:\n$p")
  }
}
