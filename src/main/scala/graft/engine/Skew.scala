package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for heavy-key aggregation at scale.
  *
  * A `groupBy(k).agg(...)` over 100 TB with a handful of hot keys puts each hot
  * key's entire partial-aggregate stream on one reducer. Salting splits every key
  * into `salt` sub-keys for the first (wide) aggregation, then combines the
  * sub-aggregates in a second (tiny) aggregation — the classic two-phase rewrite.
  * Results equal the unsalted form for decomposable aggregates (sum/count/min/
  * max); for exact distinct use a distinct-then-count or approx_count_distinct.
  *
  * (Spark's AQE skew handling — `spark.sql.adaptive.skewJoin` — covers skewed
  * *joins* at runtime; salting remains the tool for skewed *aggregations*.)
  */
object Skew {

  /** Two-phase salted `sum` + `count` by one key. The salt is derived from a
    * per-row id hash, so rows of a hot key spread uniformly over `salt`
    * reducers in phase one; phase two combines `salt` rows per key. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__sum"), count(value).as("__n"))
      .groupBy(col("key"))
      .agg(sum(col("__sum")).as("total"), sum(col("__n")).as("n"))
}
