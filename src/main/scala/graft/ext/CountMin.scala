package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable count-min frequency sketch over the portable hash family — the
  * frequency member of the sketch-table trio (HLL = distinct counts, q109;
  * quantized buckets = percentiles, q114; count-min = item frequencies).
  *
  * The pattern is the same pre-aggregation contract: build a small sketch
  * table per group (day, source, event type) ONCE, then answer "how often
  * does item X occur in ANY subset of groups" by summing cells — plain
  * integer addition, the sketch never has to see the raw data again. A
  * 1000-executor rollup ships `Depth × Width` counters per group, never
  * item keys.
  *
  * Estimates are `min` over `Depth` independent rows of hashed counters, so
  * they can only OVER-estimate (collisions add, never subtract) — the
  * classic CM guarantee: `true ≤ est ≤ true + ε·N` with
  * `ε = e/Width` at confidence `1 − e^−Depth`. Because the hashes are the
  * engine-portable md5/affine family ([[PortableHash]]), the ENTIRE
  * construction — not just a bound — replays bit-identically in an
  * independent SQL engine; the q116 oracle rebuilds every cell in DuckDB.
  */
object CountMin {

  /** Sketch geometry + hash constants, shared with the oracle-SQL builder. */
  val Depth = 4
  val Width = 256
  val Seed = 77L
  val Salt = "cms"

  private def bucketCols(itemCol: Column): Seq[Column] = {
    val h = PortableHash.hash60(
      concat_ws(":", lit(Salt), itemCol.cast("string"))) % PortableHash.P
    PortableHash.coeffs(Depth, Seed).zipWithIndex.map { case ((a, b), d) =>
      struct(lit(d).as("d"),
        (((lit(a) * h + lit(b)) % PortableHash.P) % Width).as("bucket"))
    }
  }

  /** Build the mergeable sketch table: one row per
    * `(groupCols…, d, bucket)` with its occurrence count. One pass over the
    * data (the depth explode costs ×Depth rows into a map-side-combined
    * hash aggregate); output size ≤ |groups| · Depth · Width — metadata,
    * independent of row count. */
  def sketchTable(df: DataFrame, groupCols: Seq[String], itemCol: Column): DataFrame =
    df.withColumn("__db", explode(array(bucketCols(itemCol): _*)))
      .groupBy(groupCols.map(col) ++
        Seq(col("__db.d").as("d"), col("__db.bucket").as("bucket")): _*)
      .agg(count(lit(1)).as("n"))

  /** Frequency estimates for `items` over a (caller-filtered subset of a)
    * sketch table: merge cells by `(d, bucket)` summation, then
    * `est(item) = min over d of its cell count` (absent cell = 0). Each
    * item probes exactly `Depth` cells, so the join is item-count sized —
    * the merged sketch broadcasts. */
  def estimate(table: DataFrame, items: DataFrame, itemCol: String): DataFrame = {
    val merged = table.groupBy(col("d"), col("bucket")).agg(sum(col("n")).as("n"))
    items
      .withColumn("__db", explode(array(bucketCols(col(itemCol)): _*)))
      .select(col(itemCol), col("__db.d").as("d"), col("__db.bucket").as("bucket"))
      .join(broadcast(merged), Seq("d", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
