package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column null counts, exact distinct counts, and
  * min/max, in one pass — the "what is actually in this table" report every
  * ingestion pipeline runs before trusting a new delivery.
  *
  * Shape: ONE wide aggregation computes every column's metrics together
  * (Spark plans the multi-`count_distinct` via an Expand — input rows are
  * replicated once per distinct-counted column, then a single hash-aggregate
  * tree handles all of them: one shuffle total, map-side partial-agg'd, vs
  * one job + one shuffle per column for the naive loop). The wide row is then
  * unpivoted driver-free with `stack`, so output is long-format
  * `(col_name, n_rows, n_nulls, n_distinct, min_val, max_val)` — stable schema
  * regardless of how many columns are profiled.
  *
  * min/max are cast to string so heterogeneous column types fit one report
  * column. For exact cross-engine comparison stick to int/string/date
  * columns (float→string spelling differs between engines); at 100 TB swap
  * `count_distinct` for `approx_count_distinct` — same plan shape minus the
  * Expand blowup ([[graft.engine.Gold.approxVariant]] precedent).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        count_distinct(col(c)).as(s"distinct_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackExpr = cols.map { c =>
      s"'$c', nulls_$c, distinct_$c, min_$c, max_$c"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    wide.select(col("n_rows"),
        expr(s"$stackExpr as (col_name, n_nulls, n_distinct, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_val"), col("max_val"))
  }
}
