package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact multinomial Naive Bayes — the LEARNED quality filter every
  * published curation pipeline (CCNet, FineWeb-Edu, fastText-style lang and
  * quality gates) puts where a stopword heuristic would otherwise sit.
  *
  * Why Naive Bayes and not SGD: the model is CLOSED-FORM from token counts —
  * training is two hash aggregations (per-(class, term) counts and per-class
  * totals), i.e. pure `groupBy` that any SQL engine replays exactly, with no
  * iteration order, learning rate, or float accumulation to drift across
  * engines. The log-probabilities are quantized to integer MICRO-units the
  * moment they are computed (`ROUND(1e6·ln(·))`, the BM25/idf discipline of
  * [[TextAnalysis.bm25TopDocs]]): ln() is evaluated once per (class, term) —
  * model-constant, so libm last-ulp exposure is bounded by the model size,
  * ~10 orders below the rounding grain — and every downstream quantity is an
  * integer SUM of those micro-weights, commutative and therefore bit-stable
  * across partitionings, reduce orders, and engines.
  *
  * Semantics (textbook add-1 multinomial NB):
  *  - `w(t,c)   = ROUND(1e6 · ln((cnt(t,c) + 1) / (tot_c + V)))`
  *  - `prior(c) = ROUND(1e6 · ln(n_docs_c / n_docs))`
  *  - `unseen(c)= ROUND(1e6 · ln(1 / (tot_c + V)))` — the add-1 weight of an
  *    in-vocabulary term the class never saw;
  *  - tokens outside the training vocabulary are DROPPED (the standard
  *    multinomial convention: the model has no estimate for them and every
  *    class would receive the same constant anyway only under equal totals);
  *  - `score(d,c) = prior(c) + Σ_{t ∈ d ∩ V} w'(t,c)`, argmax over classes,
  *    ties to the lexicographically smaller label. Documents with NO
  *    in-vocabulary token have no score and are absent from the prediction —
  *    callers wanting a default route them through the prior-only argmax.
  *
  * Scale shape: training shuffles are word-count economics (explode →
  * (class, term) and (class) hash aggregates, map-side combinable); the
  * model is vocabulary×classes-sized and BROADCASTS to the scoring pass
  * (the BPE-merge-table license: an index's metadata, not data); scoring is
  * explode → broadcast-join → one (doc, class)-keyed aggregate → a
  * classes-bounded per-doc window. Nothing is ever all-pairs and no
  * data-sized state reaches the driver.
  */
object Classify {

  private def tokenized(df: DataFrame, keep: Seq[String], textCol: String) =
    df.select(keep.map(col) :+
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"): _*)

  /** The trained model, one row per (label, term) seen in training:
    * `(label, term, cnt, w_micros)`. Pure aggregates + the per-model-row
    * quantized log — fully SQL-replayable (the oracle mirrors the
    * expression token for token). */
  def naiveBayesModel(train: DataFrame, labelCol: String = "label",
                      textCol: String = "text"): DataFrame = {
    val cnt = tokenized(train, Seq(labelCol), textCol)
      .groupBy(col(labelCol), col("term")).agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col(labelCol)).agg(sum(col("cnt")).as("tot"))
    val voc = cnt.agg(count_distinct(col("term")).as("v"))
    cnt.join(tot, labelCol).crossJoin(broadcast(voc))
      .select(col(labelCol), col("term"), col("cnt"),
        round(lit(1e6) * log((col("cnt") + lit(1L)) * lit(1.0)
          / (col("tot") + col("v")))).cast("long").as("w_micros"))
  }

  /** Per-class table `(label, n_docs, tot, prior_micros, unseen_micros)` —
    * classes-sized metadata, broadcast to the scorer. */
  def naiveBayesClasses(train: DataFrame, labelCol: String = "label",
                        textCol: String = "text"): DataFrame = {
    val cnt = tokenized(train, Seq(labelCol), textCol)
      .groupBy(col(labelCol), col("term")).agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col(labelCol)).agg(sum(col("cnt")).as("tot"))
    val voc = cnt.agg(count_distinct(col("term")).as("v"))
    val nd = train.groupBy(col(labelCol)).agg(count(lit(1)).as("n_docs"))
    val n = train.agg(count(lit(1)).as("n"))
    nd.join(tot, labelCol).crossJoin(broadcast(voc)).crossJoin(broadcast(n))
      .select(col(labelCol), col("n_docs"), col("tot"),
        round(lit(1e6) * log(col("n_docs") * lit(1.0) / col("n")))
          .cast("long").as("prior_micros"),
        round(lit(1e6) * log(lit(1.0) / (col("tot") + col("v"))))
          .cast("long").as("unseen_micros"))
  }

  /** Train on `train`, score every document of `toScore`: one row per
    * scoreable document, `(idCol, pred_label, score_micros)` — the argmax
    * class and its integer log-likelihood. Deterministic: integer sums,
    * ties to the smaller label. */
  def naiveBayesPredict(train: DataFrame, toScore: DataFrame,
                        idCol: String = "doc_id", labelCol: String = "label",
                        textCol: String = "text"): DataFrame = {
    val model = naiveBayesModel(train, labelCol, textCol)
    val classes = naiveBayesClasses(train, labelCol, textCol)
      .select(col(labelCol), col("prior_micros"), col("unseen_micros"))
    val vocab = model.select(col("term")).distinct()
    val scored = tokenized(toScore, Seq(idCol), textCol)
      .join(broadcast(vocab), "term") // drop out-of-vocabulary tokens
      .crossJoin(broadcast(classes))
      .join(broadcast(model.select(col(labelCol), col("term"),
        col("w_micros"))), Seq("term", labelCol), "left")
      .groupBy(col(idCol), col(labelCol), col("prior_micros"))
      .agg(sum(coalesce(col("w_micros"), col("unseen_micros"))).as("like"))
      .select(col(idCol), col(labelCol),
        (col("prior_micros") + col("like")).as("score_micros"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micros").desc, col(labelCol))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col(labelCol).as("pred_label"), col("score_micros"))
  }
}
