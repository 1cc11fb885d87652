package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign documents to
  * fixed token-budget bins ("sequences") so a downstream trainer reads full
  * sequences instead of one padded sequence per document.
  *
  * True first-fit bin packing is inherently sequential; the distributed,
  * deterministic formulation used here (and in practice by corpus-prep
  * pipelines) is BUCKETED RUNNING-TOTAL packing:
  *
  *   1. route each document to one of `buckets` streams by a deterministic
  *      hash of its id (portable [[PortableHash]] family, so an independent
  *      SQL engine routes identically);
  *   2. within a bucket, order documents by id (a total order — ids are
  *      unique) and take the running token total;
  *   3. bin index = `(runningTotal − tokens) DIV budget` — a document starts
  *      a new bin exactly when the previous documents' total has crossed the
  *      next budget boundary.
  *
  * Every step is a window function over the bucket, so the whole operator is
  * ONE shuffle on the bucket key; buckets are independent, so at corpus scale
  * parallelism = `buckets` (pick ≥ cluster cores; the per-bucket window state
  * is a single running sum, and no bucket ever needs another bucket's data —
  * unlike a global sort, there is no cross-partition carry). A document
  * larger than `budget` overflows its bin rather than being split — bins are
  * at least `budget` tokens apart in start offset, and the trainer-side
  * truncation policy stays downstream.
  *
  * Output: the input columns plus (`bucket`, `bin`, `tokens`). Fully
  * deterministic: a pure function of (id, tokens) — stable under
  * repartitioning, retries, and engines.
  */
object Packing {

  val PackSalt: String = "pack"

  /** Assign each row to a (bucket, bin) with the running-total rule above.
    * `tokensCol` must be a non-negative integer column (e.g.
    * [[TextAnalysis.tokenCount]]). */
  def packByBudget(docs: DataFrame, idCol: Column, tokensCol: Column,
                   budget: Long, buckets: Int, salt: String = PackSalt): DataFrame = {
    require(budget > 0, "packByBudget: budget must be positive")
    require(buckets > 0, "packByBudget: buckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs
      .withColumn("tokens", tokensCol.cast("long"))
      .withColumn("bucket",
        pmod(PortableHash.hash60(concat_ws(":", lit(salt), idCol.cast("string"))),
          lit(buckets.toLong)))
      .withColumn("__running", sum(col("tokens")).over(w))
      // Integer DIV keeps the bin index exact for arbitrarily large running
      // totals (a double division would round above 2^53).
      .withColumn("bin", expr(s"(__running - tokens) DIV $budget"))
      .drop("__running")
  }

  /** Per-bin rollup of a packed corpus: documents and token fill per
    * (bucket, bin). The fill distribution is the packing-quality metric
    * (ideal = every bin close to `budget`). */
  def binFill(packed: DataFrame): DataFrame =
    packed.groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("bin_tokens"))

  /** Padding-waste audit for FIXED-COUNT batching (the complement of
    * [[packByBudget]]'s fixed-budget bins): documents are cut into batches
    * of `batchSize` inside hash-assigned streams, each batch pads every
    * member to the batch max, and the audit compares ARRIVAL order against
    * LENGTH-SORTED order within the stream — the standard "sorted batching"
    * throughput win, measured exactly. Streams keep the windows partitioned
    * (never global); at corpus scale parallelism = `streams`, one shuffle
    * per strategy. Length-sorting can only shrink per-batch max spread, so
    * sorted waste ≤ arrival waste (pinned in spec).
    *
    * Output, one row per strategy (`arrival` | `sorted`):
    * `(strategy, n_batches, real_tokens, padded_tokens, waste_permille)` —
    * all integers; `waste_permille = (padded − real)·1000 DIV padded`. */
  def paddingWaste(docs: DataFrame, idCol: Column, tokensCol: Column,
                   batchSize: Int, streams: Int,
                   salt: String = "pad"): DataFrame = {
    require(batchSize > 0, "paddingWaste: batchSize must be positive")
    require(streams > 0, "paddingWaste: streams must be positive")
    val base = docs
      .select(idCol.as("__id"), tokensCol.cast("long").as("__tok"))
      .withColumn("__stream",
        pmod(PortableHash.hash60(concat_ws(":", lit(salt),
          col("__id").cast("string"))), lit(streams.toLong)))
    def audit(order: Seq[Column], strategy: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__stream")).orderBy(order: _*)
      base.withColumn("__rn", row_number().over(w))
        .withColumn("__batch", expr(s"CAST(__rn - 1 AS BIGINT) DIV $batchSize"))
        .groupBy(col("__stream"), col("__batch"))
        .agg(count(lit(1)).as("__bn"), sum(col("__tok")).as("__real"),
          max(col("__tok")).as("__max"))
        .agg(count(lit(1)).as("n_batches"),
          sum(col("__real")).as("real_tokens"),
          sum(col("__max") * col("__bn")).as("padded_tokens"))
        .withColumn("strategy", lit(strategy))
    }
    audit(Seq(col("__id")), "arrival")
      .unionByName(audit(Seq(col("__tok").desc, col("__id")), "sorted"))
      .select(col("strategy"), col("n_batches"), col("real_tokens"),
        col("padded_tokens"),
        expr("(padded_tokens - real_tokens) * 1000 DIV padded_tokens")
          .as("waste_permille"))
  }

  /** TOKEN-balanced shard assignment: shard k of K gets the docs whose
    * exclusive token prefix-sum (in deterministic portable-hash export
    * order) falls in [k·T/K, (k+1)·T/K) — `shard = ⌊prefix·K / T⌋`, the
    * standard prefix-sum partitioner. Equal-DOC shards skew wall-clock
    * when lengths are skewed; training loaders want equal TOKENS.
    *
    * The global prefix sum uses the range-exchange + partition-offset
    * machinery (NO global window): exchange on the hash order frozen to
    * scratch, per-partition token totals collected as METADATA offsets,
    * prefix = offset + partition-local exclusive running sum.
    *
    * Output: `(idCol, tokensCol, shard)` — one row per doc. `scratchDir`
    * must outlive consumption of the returned lazy frame. */
  def tokenBalancedShards(docs: DataFrame, idCol: String, tokensCol: String,
                          k: Int, scratchDir: String,
                          numPartitions: Int = 32): DataFrame = {
    require(k >= 1, s"tokenBalancedShards: k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    docs.select(col(idCol), col(tokensCol),
        PortableHash.hash60(concat(lit("shard:"), col(idCol).cast("string")))
          .as("__h"))
      .repartitionByRange(numPartitions, col("__h"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(s"$scratchDir/tbs")
    val parts = spark.read.parquet(s"$scratchDir/tbs")
    val sums = parts.groupBy(col("__pid"))
      .agg(sum(col(tokensCol)).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = sums.map(_._2).sum
    val offsets = sums.map(_._1).zip(sums.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetsDf = spark.createDataFrame(offsets.toList).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    parts
      .withColumn("__pre", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .select(col(idCol), col(tokensCol),
        expr(s"(__off + __pre) * $k DIV ${total}L").as("shard"))
  }
}
