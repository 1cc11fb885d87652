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
