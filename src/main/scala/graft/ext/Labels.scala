package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label aggregation for multi-annotator / multi-model training data.
  *
  * When several annotators (or teacher models, or dedup-cluster members)
  * assign labels to the same item, the gold label is the MAJORITY vote with
  * a deterministic tie-break — `max_by`-style "any winner" aggregation is
  * nondeterministic under ties, which silently changes the training set
  * between runs.
  *
  * Reference scope: the reference has no annotation layer; this extends the
  * gold-aggregation family (reference `pipeline/silver_to_gold.py`) to the
  * label-consolidation step every supervised-corpus build needs.
  */
object Labels {

  /** Per item: the label with the most votes; ties broken by the SMALLEST
    * label (total order ⇒ deterministic). Returns
    * `(item, label, n_votes, n_total)` where `n_total` counts all votes for
    * the item, so callers can filter on agreement ratio
    * (`n_votes / n_total`) without a second pass.
    *
    * Scale: vote counting is a map-side-combinable `groupBy(item, label)`;
    * the winner pick is a window over the item key — the second exchange is
    * (item,label)→(item), a strict coarsening, and the per-item state is one
    * row per DISTINCT label (bounded by the label alphabet, not by votes).
    * No item's vote list is ever materialized.
    */
  def majorityVote(df: DataFrame, itemCol: Column, labelCol: Column): DataFrame = {
    val votes = df
      .groupBy(itemCol.as("item"), labelCol.as("label"))
      .agg(count(lit(1)).as("n_votes"))
    val byItem = Window.partitionBy(col("item"))
    val rank = Window.partitionBy(col("item"))
      .orderBy(col("n_votes").desc, col("label").asc)
    votes
      .withColumn("n_total", sum(col("n_votes")).over(byItem))
      .withColumn("__r", row_number().over(rank))
      .filter(col("__r") === 1)
      .drop("__r")
  }

  /** Fleiss' kappa — chance-corrected inter-annotator agreement over items
    * each rated by the SAME number `n` of annotators. The go/no-go gauge on
    * an annotation batch: raw percent-agreement looks great on skewed label
    * distributions where agreeing by chance is easy; kappa subtracts that
    * chance floor.
    *
    * With per-item-label counts `n_ij` (N items, n raters, c_j = Σᵢ n_ij):
    * observed agreement  P̄  = A / B,  A = Σᵢ(Σⱼ n_ij² − n), B = N·n·(n−1);
    * expected agreement  P̄ₑ = C / D,  C = Σⱼ c_j²,           D = (N·n)²;
    * κ = (P̄−P̄ₑ)/(1−P̄ₑ) = (A·D − C·B) / (B·(D − C))
    *   = (A·N·n − C·(n−1)) / ((n−1)·(D − C))   [÷ the common N·n factor —
    * the REDUCED form is what's computed: the unreduced numerator `10⁶·A·D`
    * would overflow int64 already at N·n ≈ 10⁵ ratings].
    *
    * Everything stays INTEGER until the final ratios, which are reported in
    * micro-units via integer division (`⌊10⁶·x⌋`, truncation toward zero —
    * identical on any engine; a float pipeline here differs in the last ulp
    * between engines and between partition orders). Magnitude check: the
    * counts a, b, c, d are cast to DECIMAL(38,0) before the micro-scaled
    * products — the worst term, 10⁶·a·N·n ≤ 10⁶·N²n³ ≤ 10⁶·(N·n)³, stays
    * inside 38 digits up to N·n ≈ 10¹⁰ ratings (int64 would wrap silently
    * at ~3×10⁶ under non-ANSI mode). The quotients are IntegralDivide →
    * BIGINT, truncation toward zero on both integer and decimal operands.
    * Degenerate single-label input (d = c, zero expected-disagreement mass)
    * yields kappa_micro = NULL rather than a divide-by-zero.
    *
    * Output: one row `(n_items, n_raters, n_labels, po_micro, pe_micro,
    * kappa_micro)`.
    *
    * Scale: `groupBy(item,label)` vote counting is map-side combinable; the
    * per-item Σn_ij² collapse is a strict key coarsening ((item,label) →
    * item); label marginals are label-alphabet-sized. The final combine is
    * three one-row aggregates joined by a literal key — metadata-sized. */
  def fleissKappa(df: DataFrame, itemCol: Column, labelCol: Column): DataFrame = {
    val votes = df.groupBy(itemCol.as("item"), labelCol.as("label"))
      .agg(count(lit(1)).as("n_ij"))
    val perItem = votes.groupBy(col("item"))
      .agg(sum(col("n_ij") * col("n_ij")).as("sq"), sum(col("n_ij")).as("n"))
    val itemStats = perItem.agg(
      count(lit(1)).as("n_items"),
      min(col("n")).as("__n_min"), max(col("n")).as("n_raters"),
      sum(col("sq") - col("n")).as("a"))
    val labelStats = votes.groupBy(col("label"))
      .agg(sum(col("n_ij")).as("c_j"))
      .agg(count(lit(1)).as("n_labels"), sum(col("c_j") * col("c_j")).as("c"))
    itemStats.crossJoin(labelStats) // both one-row aggregates: broadcastable
      .select(col("n_items"), col("__n_min"), col("n_raters"), col("n_labels"),
        col("a"),
        (col("n_items") * col("n_raters") * (col("n_raters") - 1L)).as("b"),
        col("c"),
        (col("n_items") * col("n_raters") * col("n_items") * col("n_raters")).as("d"))
      .withColumn("__ok",
        when(col("__n_min") === col("n_raters"), true)
          .otherwise(raise_error(concat(lit(
            "Labels.fleissKappa: unequal rater counts per item (min "),
            col("__n_min"), lit(" vs max "), col("n_raters"),
            lit(") — Fleiss' kappa requires a constant n")))))
      .filter(col("__ok"))
      // DECIMAL(38,0) arithmetic: 10⁶·a·N·n overflows int64 past ~3×10⁶
      // ratings; decimal keeps the products exact to ~10¹⁰ ratings.
      .select(col("n_items"), col("n_raters"), col("n_labels"),
        expr("CAST(a AS DECIMAL(38,0))").as("ad"),
        expr("CAST(b AS DECIMAL(38,0))").as("bd"),
        expr("CAST(c AS DECIMAL(38,0))").as("cd"),
        expr("CAST(d AS DECIMAL(38,0))").as("dd"))
      .select(col("n_items"), col("n_raters"), col("n_labels"),
        expr("1000000 * ad DIV bd").as("po_micro"),
        expr("1000000 * cd DIV dd").as("pe_micro"),
        expr("CASE WHEN dd = cd THEN CAST(NULL AS BIGINT) ELSE " +
          "(1000000 * (ad * n_items * n_raters - cd * (n_raters - 1))) " +
          "DIV ((n_raters - 1) * (dd - cd)) END").as("kappa_micro"))
  }

  /** Per-annotator reliability estimate: each rater's agreement rate (in
    * permille) with the [[majorityVote]] consensus — the M-step of one
    * Dawid–Skene iteration (Dawid & Skene 1979, public literature) under a
    * single-accuracy (symmetric confusion) model.
    *
    * Output: `(rater, n_labels, agree_permille)`.
    *
    * Scale: votes join the item-keyed majority table (a strict coarsening
    * of the same shuffle key), then collapse to the rater alphabet —
    * per-rater state is one counter, never a vote list. */
  def raterAgreement(df: DataFrame, itemCol: Column, raterCol: Column,
                     labelCol: Column): DataFrame = {
    val maj = majorityVote(df, itemCol, labelCol)
      .select(col("item"), col("label").as("__maj"))
    df.select(itemCol.as("item"), raterCol.as("rater"), labelCol.as("label"))
      .join(maj, Seq("item"))
      .groupBy(col("rater"))
      .agg(count(lit(1)).as("n_labels"),
        sum(when(col("label") === col("__maj"), 1L).otherwise(0L)).as("__agree"))
      .select(col("rater"), col("n_labels"),
        expr("__agree * 1000 DIV n_labels").as("agree_permille"))
  }

  /** Reliability-weighted relabel: the E-step closing one Dawid–Skene
    * round. Each vote counts its rater's [[raterAgreement]] permille
    * (a broadcast rater-alphabet-sized table); the item's label is the
    * arg-max weighted label, ties to the smallest label. Output per item:
    * `(item, maj_label, weighted_label)` — downstream confusion summaries
    * show exactly which consensus calls the reweighting flipped.
    *
    * Scale: same two exchanges as [[majorityVote]] ((item,label) then
    * item); the weight join is map-side against the broadcast rater table. */
  def weightedRelabel(df: DataFrame, itemCol: Column, raterCol: Column,
                      labelCol: Column): DataFrame = {
    val weights = raterAgreement(df, itemCol, raterCol, labelCol)
      .select(col("rater"), col("agree_permille").as("__w"))
    val maj = majorityVote(df, itemCol, labelCol)
      .select(col("item"), col("label").as("maj_label"))
    val weighted = df
      .select(itemCol.as("item"), raterCol.as("rater"), labelCol.as("label"))
      .join(broadcast(weights), Seq("rater"))
      .groupBy(col("item"), col("label"))
      .agg(sum(col("__w")).as("__mass"))
    val pick = Window.partitionBy(col("item"))
      .orderBy(col("__mass").desc, col("label").asc)
    weighted
      .withColumn("__r", row_number().over(pick))
      .filter(col("__r") === 1)
      .select(col("item"), col("label").as("weighted_label"))
      .join(maj, Seq("item"))
      .select(col("item"), col("maj_label"), col("weighted_label"))
  }
}
