package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact heavy hitters by two-pass sketch-then-recount — the streaming-classic
  * Misra–Gries summary as a mergeable typed `Aggregator`, used only as a
  * CANDIDATE GENERATOR so the final answer is exact and order-independent.
  *
  * Why not one exact `groupBy(key).count`? At 100 TB the full key-count table
  * is itself huge (vocabulary-sized), and "which keys exceed 1/(k+1) of the
  * stream" needs only a k-counter summary per partition. Why not count-min
  * (ext/CountMin.scala, q116)? Count-min answers point queries over a FIXED
  * candidate list; Misra–Gries DISCOVERS the candidates — the two compose
  * (this file answers "what are the heavy keys", count-min answers "how heavy
  * is this key, approximately, later").
  *
  * Determinism: a Misra–Gries summary's residual counts depend on arrival and
  * merge order, so the summary itself is never emitted. Its guarantee is
  * order-INDEPENDENT: after any reduce/merge schedule, every key with true
  * frequency > n/(capacity+1) still owns a counter (each decrement/offset
  * step removes one occurrence of capacity+1 DISTINCT keys, so a key can be
  * decremented at most n/(capacity+1) times — the pigeonhole argument from
  * Misra–Gries 1982 and the mergeable-summaries literature, implemented from
  * the argument, no reference code). The second pass recounts ONLY the ≤
  * `capacity` candidate keys exactly and applies the threshold — identical
  * output to the full-table query, at candidate-set cost.
  *
  * Scale shape: pass 1 is one partial-aggregating job whose shuffled state is
  * `capacity` counters per partition (metadata-sized); the candidate list
  * collected to the driver is ≤ `capacity` entries (same license as the
  * IVF/PQ centroid collects). Pass 2 is a broadcast `isin` filter + map-side
  * combined count over the candidate keys only.
  */
object HeavyHitters {

  /** Mergeable Misra–Gries summary over string keys, capacity-bounded.
    * Buffer = key → residual count, ≤ `capacity` entries at all times. */
  class MisraGriesAggregator(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, s"MisraGries: capacity must be >= 1, got $capacity")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
      if (key == null) buf
      else buf.get(key) match {
        case Some(c) => buf.updated(key, c + 1L)
        case None if buf.size < capacity => buf.updated(key, 1L)
        case None =>
          // Classic step: decrement every counter (this occurrence plus one
          // from each of `capacity` distinct keys vanish together).
          buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = b.foldLeft(a) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      }
      if (combined.size <= capacity) combined
      else {
        // Mergeable-summaries offset: subtract the (capacity+1)-th largest
        // residual from every counter; ≤ capacity survive, and each unit of
        // offset removes one occurrence of > capacity distinct keys.
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        combined.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }
    }

    override def finish(buf: Map[String, Long]): Map[String, Long] = buf

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Untyped column form: `df.agg(misraGries(cap)(col))` → map<string,bigint>. */
  def misraGries(capacity: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGriesAggregator(capacity),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())

  /** One emitted summary row of the STREAMING Misra–Gries state: after
    * processing its `tick`-th micro-batch, shard `shard` holds `residual`
    * for `key` (≤ capacity rows per (shard, tick)). */
  case class MgTick(shard: Int, tick: Long, key: String, residual: Long)

  /** Per-shard streaming state: ticks processed + the ≤ capacity counter
    * map (public: the state encoder's generated code needs the accessors). */
  case class MgState(tick: Long, counts: Map[String, Long])

  /** STREAMING Misra–Gries — the unbounded-stream form of the batch
    * aggregator above: keys arrive as a stream pre-sharded by
    * `hash(key) % nShards`, and `flatMapGroupsWithState` keeps ONE
    * capacity-bounded counter map per shard, folding each micro-batch's
    * keys in with the exact same reduce step (increment / open / decrement-
    * all) and emitting the shard's current summary rows after every batch.
    *
    * Candidate-superset guarantee, unchanged from batch: a key lives in
    * exactly one shard, so a key with TRUE frequency > n/(capacity+1) of
    * the whole stream has frequency > n_shard/(capacity+1) of its shard
    * (n_shard ≤ n) and therefore still owns a counter after ANY tick
    * sequence — the pigeonhole argument is arrival-order-free, which is
    * precisely why the summary (whose residuals DO depend on order) is
    * only ever a candidate generator. The exact answer comes from the same
    * second recount pass as the batch path, so streaming ticks and the
    * one-shot batch produce IDENTICAL final heavy-hitter sets
    * (Round14eSpec proves it over a 3-tick replay).
    *
    * Scale: state is `nShards × capacity` counters TOTAL — bounded by
    * configuration, not stream volume (the sessionizer's state discipline);
    * each tick shuffles only the batch's (shard, key) rows on the shard
    * key; emitted rows per tick are state-sized. `nShards` sets the
    * stateful parallelism — one shard is one task's state. */
  def streamingShardSummaries(keys: org.apache.spark.sql.Dataset[(Int, String)],
                              capacity: Int): org.apache.spark.sql.Dataset[MgTick] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import keys.sparkSession.implicits._
    require(capacity >= 1, s"streamingShardSummaries: capacity must be >= 1, got $capacity")
    val agg = new MisraGriesAggregator(capacity)
    keys.groupByKey(_._1)
      .flatMapGroupsWithState[MgState, MgTick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard, batch, state: org.apache.spark.sql.streaming.GroupState[MgState]) =>
          val prev = state.getOption.getOrElse(MgState(0L, Map.empty))
          val counts = batch.foldLeft(prev.counts)((m, r) => agg.reduce(m, r._2))
          val tick = prev.tick + 1L
          state.update(MgState(tick, counts))
          counts.iterator.map { case (k, c) => MgTick(shard, tick, k, c) }
      }
  }

  /** Exact keys with frequency strictly above `n / (capacity + 1)` of the
    * non-null `key` stream, with their exact counts — `(key_out, cnt)` rows.
    *
    * EAGER: pass 1 (count + Misra–Gries candidates, one job) collects ONE
    * summary row; pass 2 returns the lazy exact-recount plan over the ≤
    * `capacity` candidates. Output is identical to the full
    * `groupBy(key).count.filter(cnt*(capacity+1) > n)` by the superset
    * guarantee above — the sketch can only ADD spurious candidates, and the
    * exact threshold removes them. */
  def exactHeavyHitters(df: DataFrame, key: Column, capacity: Int,
                        keyName: String = "key"): DataFrame = {
    val keyed = df.select(key.cast("string").as("__k")).filter(col("__k").isNotNull)
    val first = keyed.agg(count(lit(1)).as("n"),
      misraGries(capacity)(col("__k")).as("cands")).head()
    val n = first.getAs[Long]("n")
    val cands: Seq[String] = first.getAs[Map[String, Long]]("cands").keys.toSeq
    if (cands.isEmpty) {
      keyed.sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keyName,
            org.apache.spark.sql.types.StringType, nullable = true),
          org.apache.spark.sql.types.StructField("cnt",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      keyed.filter(col("__k").isin(cands: _*))
        .groupBy(col("__k").as(keyName))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (capacity + 1L) > lit(n))
    }
  }
}
