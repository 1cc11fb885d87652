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
  * model is FLOORED-vocabulary×classes-sized — `minCount`/`maxVocab` bound
  * the retained vocabulary, so the broadcast stays metadata-sized even on a
  * web-scale corpus with ~10⁹ raw distinct tokens (the BPE-merge-table
  * license holds because the caller chose the bound); scoring is
  * explode → broadcast-join → one (doc, class)-keyed aggregate → a
  * classes-bounded per-doc window. Nothing is ever all-pairs and no
  * data-sized state reaches the driver.
  */
object Classify {

  private def tokenized(df: DataFrame, keep: Seq[String], textCol: String) =
    df.select(keep.map(col) :+
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"): _*)

  /** Per-(label, term) training counts, FLOORED to the retained vocabulary:
    * terms whose corpus-wide training count is under `minCount` are dropped
    * before any weight is computed, and (optionally) only the `maxVocab`
    * most frequent floored terms are kept (frequency rank, ties to the
    * lexicographically smaller term — deterministic). This is the pruning
    * every published NB/fastText-class gate applies first: a web-scale
    * corpus has ~10⁹ distinct tokens (typos, hex ids, boilerplate hashes),
    * and without a floor the "metadata-sized" broadcast model is data-sized
    * long before the fact table is the problem. With the floor the model is
    * `min(maxVocab, |{t: count(t) ≥ minCount}|) × classes` rows — a real
    * bound the caller chooses.
    *
    * `minCount ≤ 1` with `maxVocab ≤ 0` short-circuits to the raw counts —
    * byte-identical plan to the unfloored path (no extra aggregate/join).
    * The maxVocab rank runs through [[Rank.valueAtRanks]]'s distributed
    * selection (range-partition on the frequency key, sort only the
    * partition holding rank maxVocab), NOT a global `row_number` window:
    * even the min-count-FLOORED vocab of a web corpus can pass 10⁸ terms,
    * and the window funneled all of them through one reducer. The cut row
    * is the `(term_total, term)` pair at frequency rank `maxVocab`
    * (count desc, term asc — the same deterministic tie order as the
    * window it replaces); keep = strictly more frequent, or tied on count
    * with `term ≤ cut.term`. A NULL cut (vocab smaller than maxVocab)
    * keeps everything. */
  private def flooredCnt(train: DataFrame, labelCol: String, textCol: String,
                         minCount: Long, maxVocab: Int): DataFrame = {
    val cnt = tokenized(train, Seq(labelCol), textCol)
      .groupBy(col(labelCol), col("term")).agg(count(lit(1)).as("cnt"))
    if (minCount <= 1L && maxVocab <= 0) cnt
    else {
      val termTot = cnt.groupBy(col("term"))
        .agg(sum(col("cnt")).as("term_total"))
        .where(col("term_total") >= minCount)
      val kept =
        if (maxVocab <= 0) termTot.select(col("term"))
        else {
          val cut = Rank.valueAtRanks(
            termTot.select(col("term"), col("term_total"),
              (-col("term_total")).as("__negtt"),
              struct(col("term_total"), col("term")).as("__cut")),
            orderCols = Seq("__negtt", "term"), value = "__cut",
            namedRanks = _ => Seq("cut" -> maxVocab.toLong))
          termTot.crossJoin(broadcast(cut))
            .where(col("cut").isNull
              || col("term_total") > col("cut.term_total")
              || (col("term_total") === col("cut.term_total")
                && col("term") <= col("cut.term")))
            .select(col("term"))
        }
      cnt.join(kept, Seq("term"), "left_semi")
    }
  }

  /** The trained model, one row per (label, term) in the retained
    * vocabulary: `(label, term, cnt, w_micros)`. Pure aggregates + the
    * per-model-row quantized log — fully SQL-replayable (the oracle mirrors
    * the expression token for token). Class totals and V are computed over
    * the FLOORED counts, so the add-1 semantics are exactly "the model was
    * trained on the retained vocabulary" (dropped terms are out-of-vocab at
    * scoring time too — the standard convention). */
  def naiveBayesModel(train: DataFrame, labelCol: String = "label",
                      textCol: String = "text", minCount: Long = 1L,
                      maxVocab: Int = 0): DataFrame = {
    val cnt = flooredCnt(train, labelCol, textCol, minCount, maxVocab)
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
                        textCol: String = "text", minCount: Long = 1L,
                        maxVocab: Int = 0): DataFrame = {
    val cnt = flooredCnt(train, labelCol, textCol, minCount, maxVocab)
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

  /** Score `toScore` against an ALREADY-TRAINED model — the scoring half of
    * [[naiveBayesPredict]] factored out so a pre-built model can gate both
    * the batch funnel and the streaming ingest path (models train offline;
    * gates run wherever the data arrives). `model` is [[naiveBayesModel]]'s
    * output, `classes` is [[naiveBayesClasses]]'s (or any frames with those
    * columns); both are metadata-sized and broadcast. Output and
    * determinism exactly as [[naiveBayesPredict]]. */
  def naiveBayesScore(model: DataFrame, classes: DataFrame, toScore: DataFrame,
                      idCol: String = "doc_id", labelCol: String = "label",
                      textCol: String = "text"): DataFrame = {
    val cls = classes.select(col(labelCol), col("prior_micros"),
      col("unseen_micros"))
    val vocab = model.select(col("term")).distinct()
    val scored = tokenized(toScore, Seq(idCol), textCol)
      .join(broadcast(vocab), "term") // drop out-of-vocabulary tokens
      .crossJoin(broadcast(cls))
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

  /** Train on `train`, score every document of `toScore`: one row per
    * scoreable document, `(idCol, pred_label, score_micros)` — the argmax
    * class and its integer log-likelihood. Deterministic: integer sums,
    * ties to the smaller label. */
  def naiveBayesPredict(train: DataFrame, toScore: DataFrame,
                        idCol: String = "doc_id", labelCol: String = "label",
                        textCol: String = "text", minCount: Long = 1L,
                        maxVocab: Int = 0): DataFrame =
    naiveBayesScore(
      naiveBayesModel(train, labelCol, textCol, minCount, maxVocab),
      naiveBayesClasses(train, labelCol, textCol, minCount, maxVocab),
      toScore, idCol, labelCol, textCol)

  /** Streaming sibling of the batch NB gate — q379's learned quality stage
    * in the production ingest loop (the
    * [[graft.ext.Dedup.streamingFunnelTick]] shape): each micro-batch is
    * scored against the PRE-TRAINED broadcast model (training is offline —
    * two hash aggregates over the labeled corpus — scoring is wherever the
    * data arrives), and tick `n`'s predictions land as the batch-id-keyed
    * overwrite partition `predsDir/batch=n`, so a replayed micro-batch
    * overwrites its own partial write: exactly-once across restarts, the
    * established streaming-tick contract.
    *
    * Stateless across ticks by construction — NB scoring is per-document,
    * so summed tick outputs equal the one-shot batch [[naiveBayesScore]]
    * over the union of the ticks (Round15bSpec proves it on a 3-tick
    * landing). `model`/`classes` must be PRE-MATERIALIZED metadata-sized
    * frames (collected once into the plan, not recomputed per tick). */
  def streamingNbScoreTick(docsStream: DataFrame, model: DataFrame,
                           classes: DataFrame, predsDir: String,
                           checkpointDir: String, idCol: String = "doc_id",
                           labelCol: String = "label",
                           textCol: String = "text"): Unit = {
    val query = docsStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          naiveBayesScore(model, classes, batch, idCol, labelCol, textCol)
            .write.mode("overwrite").parquet(s"$predsDir/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()
  }
}
