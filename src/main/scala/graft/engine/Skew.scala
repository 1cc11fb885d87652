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

  /** Full decomposable-stats variant: salted `sum`/`count`/`min`/`max` plus the
    * derived `avg` (= combined sum / combined count — avg itself is not
    * directly decomposable, its sum/count parts are). Same two-phase shape as
    * [[saltedSumCount]]: wide phase on (key, salt), tiny combine phase on key.
    */
  def saltedStats(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__sum"), count(value).as("__n"),
        min(value).as("__min"), max(value).as("__max"))
      .groupBy(col("key"))
      .agg(sum(col("__sum")).as("total"), sum(col("__n")).as("n"),
        min(col("__min")).as("min"), max(col("__max")).as("max"))
      .withColumn("avg", col("total") / col("n"))

  /** Exact two-phase COUNT(DISTINCT value) per key without funneling a hot
    * key's whole value stream through one reducer.
    *
    * The salt is derived from the VALUE (not a row id): every occurrence of a
    * given value lands in exactly one (key, salt) bucket, so per-bucket
    * `count_distinct` values are disjoint and phase two can just add them.
    * Phase one shuffles on (key, salt) — a hot key spreads over `salt`
    * reducers, each holding ~1/salt of its distinct values; phase two combines
    * `salt` small rows per key. (A row-id salt would double-count values that
    * straddle buckets; this is why the salt MUST come from the value.) */
  def saltedCountDistinct(df: DataFrame, key: Column, value: Column, salt: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(value), lit(salt)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(count_distinct(value).as("__nd"))
      .groupBy(col("key"))
      .agg(sum(col("__nd")).as("n_distinct"))

  /** Salted replicated join for a hot-key equi-join: the big side salts each
    * row deterministically (hash of `discriminator`, which must vary within
    * a key — a line number, a row id column), the small side is replicated
    * once per salt value, and the join key becomes (keys, salt) — so a hot
    * key's rows spread over `salt` tasks instead of funneling through one.
    * Exactly equivalent to the plain inner join: each big row matches
    * precisely the one replica carrying its salt, so nothing is lost or
    * double-counted; keys absent from `small` drop on both forms.
    *
    * When to use which skew tool: AQE's skew-join split repairs a skewed
    * SORT-MERGE join at runtime by splitting oversized partitions; explicit
    * salting is the static guarantee for when the small side is replicable
    * (dimension-sized × salt must still broadcast/fit), when AQE's
    * post-shuffle view can't see the skew (e.g. skew created by the join
    * itself), or when a pipeline must behave identically with AQE off.
    * Aggregation skew stays with [[saltedSumCount]]/[[saltedStats]]. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 discriminator: Column, salt: Int = 16): DataFrame = {
    require(salt >= 1, s"saltedJoin: salt must be >= 1, got $salt")
    val salted = big.withColumn("__salt", pmod(xxhash64(discriminator), lit(salt)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
