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
}
