package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a DataFrame.
  *
  * Generalizes the reference's hand-rolled silver checks (reference
  * pipeline/bronze_to_silver.py:35-176 hardcodes null/enum/range tests per
  * table) into a rule LIST evaluated in ONE aggregation pass: each rule is a
  * named boolean Column; the report is per-rule rows_checked / violations /
  * pass_rate. This is the "expectations" shape popularized by Delta Live
  * Tables & Great Expectations, kept engine-native.
  *
  * Scale: all rules ride a single scan + partial aggregate — adding a rule
  * adds one codegen'd SUM(CASE), not a pass. No shuffle beyond the final
  * 1-row reduce; at 100 TB this is the cheapest possible audit. `quarantine`
  * splits the input in one filter each way so a pipeline can route bad rows
  * without recomputing the rules.
  */
object Expectations {

  /** One named expectation: `predicate` must hold for a row to pass. */
  final case class Rule(name: String, predicate: Column)

  /** Long-format report: (rule, rows_checked, violations, pass_rate6).
    * Violations count rows where the predicate is false OR null — an
    * unevaluable expectation is a failing one, matching validation semantics
    * in Silver (engine/Silver.scala OP-11). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.report: empty rule list")
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => sum(when(coalesce(r.predicate, lit(false)), 0L).otherwise(1L))
        .as(s"__v_${r.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Unpivot the single wide row to long format driver-side: it is one row
    // of `rules.size + 1` longs — metadata-sized by construction.
    val row = wide.collect().head
    val n = row.getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    rules.zipWithIndex.map { case (r, i) =>
      val v = row.getLong(i + 1)
      val rate = if (n == 0L) 1.0
      else BigDecimal((n - v).toDouble / n.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r.name, n, v, rate)
    }.toDF("rule", "rows_checked", "violations", "pass_rate6")
  }

  /** Split `df` into (passing, quarantined) by the CONJUNCTION of all rules.
    * Each side is one filter over the scan; rows failing ANY rule quarantine. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "Expectations.quarantine: empty rule list")
    val allPass = rules.map(r => coalesce(r.predicate, lit(false)))
      .reduce(_ && _)
    (df.filter(allPass), df.filter(!allPass))
  }

  /** One cross-table referential-integrity check: child rows whose
    * `fk` value has no match in `parent[pk]`, as a 1-row frame
    * `(<name>_checked, <name>_orphans)`. NULL fks are counted as orphans
    * (an unjoinable row is a broken reference for audit purposes — note
    * this is NOT SQL `NOT IN` semantics, which a NULL poisons to empty;
    * see q95 for that contract).
    *
    * The check is a LEFT ANTI join on the fk — at scale that is a shuffle
    * (or broadcast, for dimension-sized parents) hash join, the same cost
    * as the production join it is guarding. Several checks compose with
    * `crossJoin` into a single audit row (each arm is an independent 1-row
    * aggregate — q89's empty-safe pattern). */
  def orphanCount(child: DataFrame, fk: String,
                  parent: DataFrame, pk: String, name: String): DataFrame = {
    val orphans = child.select(col(fk))
      .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")
    child.agg(count(lit(1)).as(s"${name}_checked"))
      .crossJoin(orphans.agg(count(lit(1)).as(s"${name}_orphans")))
  }

  /** Functional-dependency audit: does `lhs` determine `rhs`? One row —
    * `(fd, n_keys, n_violating_keys, max_variants)`, where a violating key
    * is an lhs value mapped to >1 distinct rhs tuple. The schema-inference /
    * data-contract check behind "is this column a safe join key for that
    * attribute" — `n_violating_keys = 0` certifies the FD holds on this
    * snapshot.
    *
    * Scale: one `groupBy(lhs)` whose state per key is the distinct rhs
    * count (bounded by rhs cardinality under that key), then a one-row
    * collapse. Strict key coarsening, no join. */
  def functionalDependency(df: DataFrame, name: String,
                           lhs: Seq[String], rhs: Seq[String]): DataFrame =
    df.groupBy(lhs.map(col): _*)
      .agg(countDistinct(struct(rhs.map(col): _*)).as("__v"))
      .agg(lit(name).as("fd"), count(lit(1)).as("n_keys"),
        sum(when(col("__v") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
        max(col("__v")).as("max_variants"))
}
