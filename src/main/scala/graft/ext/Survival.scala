package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Kaplan–Meier survival estimation with right-censoring — the standard
  * product-limit estimator (Kaplan & Meier 1958, JASA 53:457), integer-exact
  * so the curve is hash-verifiable against an independent engine.
  *
  * The float formulation `S(t) = Π (1 − dᵢ/nᵢ)` accumulates division error
  * in an ORDER-dependent way, so two engines disagree in the last ulp and a
  * hash compare is impossible. Here survival is carried in parts-per-billion
  * with an explicit floor recurrence:
  *
  *   S₀ = 10⁹;   Sᵢ = ⌊Sᵢ₋₁ · (nᵢ − dᵢ) / nᵢ⌋
  *
  * over the risk rows ordered by time — both engines (this object and the
  * DuckDB recursive-CTE oracle in q239) run the SAME integer recurrence, so
  * equality is exact, not tolerance-based. Max error vs the real-valued
  * estimator is one ppb per distinct event time — statistically invisible.
  *
  * SCALE: the recurrence is inherently sequential, but it runs over the
  * RISK TABLE — one row per distinct (day-grain) duration, calendar-sized
  * (hundreds of rows at any corpus size), never the event data. The
  * data-sized work is two distributed passes: per-subject endpoints
  * (groupBy subject) and the per-duration death/censor counts (groupBy
  * duration). The risk-table collect is the same metadata license as the
  * IVF/PQ centroid collects; the suffix-sum window over it is allowlisted
  * calendar-sized (PlanGuardSpec). Overflow bound: Sᵢ ≤ 10⁹ and nᵢ ≤ n keep
  * the product under 2⁶³ for n < 9.2×10⁹ subjects — document-scale safe;
  * beyond that, drop the scale to 10⁶ (ppm).
  */
object Survival {

  /** The Kaplan–Meier curve over `durations(d: BIGINT, ev: INT)` — one row
    * per subject, `d` = observed duration (day grain recommended), `ev` = 1
    * if the event occurred at `d`, 0 if the subject was censored at `d`.
    *
    * Returns one row per DISTINCT duration, ordered fields
    * `(d, at_risk, deaths, censored, surv_ppb)`: `at_risk` counts subjects
    * with duration ≥ d, and `surv_ppb` is the product-limit estimate ×10⁹
    * AFTER the deaths at `d` (censor-only rows multiply by (n−0)/n = 1 and
    * leave the curve flat, matching the standard estimator). */
  def kaplanMeier(durations: DataFrame): DataFrame = {
    val spark = durations.sparkSession
    val risk0 = durations.groupBy(col("d"))
      .agg(sum(col("ev")).cast("long").as("deaths"),
        sum(lit(1) - col("ev")).cast("long").as("censored"))
    // suffix sum over the calendar-sized risk table: at_risk(d) = #{dur ≥ d}
    val w = Window.orderBy(col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = risk0
      .withColumn("at_risk", sum(col("deaths") + col("censored")).over(w))
      .select("d", "at_risk", "deaths", "censored")
    // sequential product-limit fold on the driver — risk is calendar-sized
    val rows = risk.collect().sortBy(_.getLong(0))
    var surv = 1000000000L
    val out = rows.map { r =>
      val (d, n, dd, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      surv = surv * (n - dd) / n
      Row(d, n, dd, cc, surv)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq("d", "at_risk", "deaths", "censored", "surv_ppb")
        .map(StructField(_, LongType, nullable = false))))
  }
}
