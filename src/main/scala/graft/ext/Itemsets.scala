package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining via the Apriori candidate ladder (Agrawal &
  * Srikant 1994, VLDB — "Fast Algorithms for Mining Association Rules"),
  * distributed as bounded equi-joins.
  *
  * The scale hazard of itemset mining is candidate blow-up: enumerating
  * item combinations GLOBALLY is |items|^k. Apriori's monotonicity (every
  * subset of a frequent set is frequent) bounds the work instead:
  *
  *   L1: frequent ITEMS (one groupBy) — baskets are pruned to them, so
  *       every later explode is over surviving items only;
  *   L2: frequent PAIRS from per-basket self-joins — the explode is
  *       C(basket,2), bounded by the basket-size contract (order baskets
  *       here are ≤ 7 lines), never items²;
  *   C3: candidate triples from per-basket self-joins over pruned baskets,
  *       kept only when ALL THREE sub-pairs are in L2 — three broadcast
  *       semi-joins against the (support-pruned, metadata-sized) L2;
  *   L3: support count of survivors (one groupBy).
  *
  * The prune is an OPTIMIZATION, not a semantics change — monotonicity
  * guarantees L3 equals the naive "count all triples, filter support"
  * answer, which is exactly what q241's DuckDB oracle computes (the
  * un-pruned form), certifying the ladder loses nothing.
  *
  * All joins are equi-joins on the basket key or the L2 pair key; per-basket
  * work is C(b,3) with b bounded; support counts are map-side-combinable
  * groupBys. No global candidate enumeration anywhere.
  */
object Itemsets {

  /** Distinct `(b, i)` membership rows of baskets holding at most
    * `maxBasketSize` distinct items — the shared hub-basket guard every
    * per-basket generation in this module (and the co-purchase graph
    * builders in SparkEntry) goes through. Over-cap baskets are DROPPED
    * whole: one 10⁴-item bot/aggregation basket would otherwise contribute
    * C(10⁴,2) ≈ 5·10⁷ pair rows (C(10⁴,3) ≈ 10¹¹ triples) on its own.
    *
    * ONE exchange total, measured: every consumer of this function
    * SELF-JOINS the result on the basket key, so the right currency is
    * exchanges across the whole consumer pipeline, not this function alone.
    * `repartition(b)` is the single wide exchange; `hashpartitioning(b)`
    * satisfies the dedup's `ClusteredDistribution(b, i)` (same b ⇒ same
    * partition ⇒ same (b,i) co-located), the cap window's partition-by-b,
    * AND both sides of the downstream b-keyed self-joins — so dedup, cap,
    * and pair/triple generation all run exchange-free on top of it. The
    * two shapes this replaces both paid more, measured at sf0.1 on the
    * q242 membership table (shuffle bytes written, environment-independent):
    * distinct + count-over-window re-exchange 24.2 MB; distinct + broadcast
    * anti-join blacklist 28.0 MB (the "normally empty blacklist" reasoning
    * ignored that the probe and sizing sides each recompute the distinct
    * exchange, and that consumers re-exchange by b anyway); this shape
    * 18.0 MB — below even the uncapped form, because the explicit
    * b-partitioning is reused where distinct's (b,i)-partitioning cannot be.
    * Skew bound: a partition's surplus is the largest single basket
    * (linear, 10⁴ rows for the pathological basket), never quadratic. */
  def cappedBasketItems(baskets: DataFrame, basketCol: String, itemCol: String,
                        maxBasketSize: Long): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize must be >= 2, got $maxBasketSize")
    val byB = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .repartition(col("b"))
      .dropDuplicates("b", "i")
    val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("b"))
    byB.withColumn("__bs", count(lit(1)).over(wb))
      .where(col("__bs") <= maxBasketSize).drop("__bs")
  }

  /** Co-occurrence pair counts `(p1 < p2, n)` over capped baskets — the
    * basket self-join bounded by [[cappedBasketItems]], shared by
    * [[associationRules]] and the co-purchase graph queries (q242/q252) so
    * no caller re-derives the join without the hub guard. Per-basket work
    * is C(b,2) with b ≤ `maxBasketSize`; the join is equi on the basket
    * key; the count is a map-side-combinable groupBy. */
  def pairCounts(baskets: DataFrame, basketCol: String, itemCol: String,
                 maxBasketSize: Long = 1000L): DataFrame = {
    val it = cappedBasketItems(baskets, basketCol, itemCol, maxBasketSize)
    it.as("a").join(it.as("x"), expr("a.b = x.b AND a.i < x.i"))
      .groupBy(col("a.i").as("p1"), col("x.i").as("p2"))
      .agg(count(lit(1)).as("n"))
  }

  /** Triples `(p1 < p2 < p3, n)` of items co-occurring in at least
    * `minSupport` baskets, over `baskets(basketCol, itemCol)` (duplicates
    * within a basket are collapsed; items must be orderable).
    *
    * `maxBasketSize` caps the per-basket explode: a single pathological
    * basket of 10⁴ items contributes C(10⁴,3) ≈ 10¹¹ candidate rows — the
    * hub-degree problem in basket form — so baskets above the cap are
    * DROPPED before generation (the [[graft.ext.Graph.triangleStats]]
    * `maxDegree` mitigation; counts then describe the capped corpus, which
    * is the right diagnostic — a 10⁴-item basket is a bot/aggregation
    * artifact, not co-purchase signal). Order baskets here are ≤7 lines,
    * far under any sensible cap. */
  def frequentTriples(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketSize: Long = 1000L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketSize >= 3, s"maxBasketSize must be >= 3, got $maxBasketSize")
    val it = cappedBasketItems(baskets, basketCol, itemCol, maxBasketSize)
    // L1: keep only items frequent on their own (monotonicity prune #1)
    val l1 = it.groupBy(col("i")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minSupport).select(col("i"))
    val pruned = it.join(broadcast(l1), Seq("i")).select(col("b"), col("i"))
    // L2: frequent pairs from bounded per-basket self-joins
    val pairGen = pruned.as("a")
      .join(pruned.as("x"), expr("a.b = x.b AND a.i < x.i"))
      .select(col("a.i").as("p1"), col("x.i").as("p2"), col("a.b").as("b"))
    val l2 = pairGen.groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n")).where(col("n") >= minSupport)
      .select(col("p1"), col("p2"))
    // C3: per-basket triples, all three sub-pairs frequent (prune #2)
    val triGen = pairGen.as("pq")
      .join(pruned.as("y"), expr("pq.b = y.b AND pq.p2 < y.i"))
      .select(col("pq.p1").as("p1"), col("pq.p2").as("p2"),
        col("y.i").as("p3"), col("pq.b").as("b"))
    val c3 = triGen
      .join(broadcast(l2), Seq("p1", "p2"), "left_semi")
      .join(broadcast(l2.select(col("p1"), col("p2").as("p3"))),
        Seq("p1", "p3"), "left_semi")
      .join(broadcast(l2.select(col("p1").as("p2"), col("p2").as("p3"))),
        Seq("p2", "p3"), "left_semi")
    // L3: support count of the surviving candidates
    c3.groupBy(col("p1"), col("p2"), col("p3"))
      .agg(count(lit(1)).as("n")).where(col("n") >= minSupport)
  }

  /** Association rules `ante → cons` from frequent pairs: kept when
    * support ≥ `minSupport`, confidence ≥ `minConfPermille`/1000, and
    * lift > 1 — with every threshold evaluated CROSS-MULTIPLIED in integers
    * (`1000·n_both ≥ conf·n_ante`; `n_both·N > n_ante·n_cons`), so rule
    * membership is never decided by a float ratio. Both directions of a
    * pair are scored (confidence is asymmetric).
    *
    * Output: `(ante, cons, n_ante, n_cons, n_both, n_baskets)` — the raw
    * counts, from which confidence/lift are consumer-side ratios.
    *
    * Scale: item supports and pair supports are map-side-combinable
    * groupBys; the rule join is equi on the item key against the
    * support-pruned item table; N re-joins via the broadcast one-row
    * re-wrap. Overflow: n_both·N ≤ N² needs N < 3×10⁹ baskets — beyond
    * that, pre-divide N's scale. Over-cap baskets are dropped whole
    * ([[cappedBasketItems]]) from BOTH the pair counts and the item/basket
    * supports, so every count describes the same capped corpus. */
  def associationRules(
      baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, minConfPermille: Long,
      maxBasketSize: Long = 1000L): DataFrame = {
    require(minConfPermille >= 0 && minConfPermille <= 1000,
      s"minConfPermille must be in [0,1000], got $minConfPermille")
    val it = cappedBasketItems(baskets, basketCol, itemCol, maxBasketSize)
    val nB = it.agg(countDistinct(col("b")).as("n_baskets"))
    val supp = it.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = pairCounts(baskets, basketCol, itemCol, maxBasketSize)
      .withColumnRenamed("n", "n_both").where(col("n_both") >= minSupport)
    val directed = pairs.select(col("p1").as("ante"), col("p2").as("cons"), col("n_both"))
      .union(pairs.select(col("p2").as("ante"), col("p1").as("cons"), col("n_both")))
    directed
      .join(supp.select(col("i").as("ante"), col("n_i").as("n_ante")), Seq("ante"))
      .join(supp.select(col("i").as("cons"), col("n_i").as("n_cons")), Seq("cons"))
      .crossJoin(broadcast(nB))
      .where(lit(1000L) * col("n_both") >= lit(minConfPermille) * col("n_ante")
        && col("n_both") * col("n_baskets") > col("n_ante") * col("n_cons"))
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_both"), col("n_baskets"))
  }
}
