package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration of a binary-outcome rate
  * against a bucketed score — the standard probability-calibration step for
  * ML scores (Zadrozny & Elkan 2002; Robertson, Wright & Dykstra,
  * "Order Restricted Statistical Inference").
  *
  * Instead of the sequential PAVA stack, this uses the closed-form MINIMAX
  * characterization of the isotonic fit:
  *
  *   ŷᵢ = min_{j ≥ i} max_{k ≤ i} mean(y[k..j])
  *
  * computed over the BUCKET GRID, which makes it embarrassingly parallel
  * and oracle-replayable: the data-sized work is one groupBy that reduces
  * the observations to ≤B (bucket, weight, positives) rows; the O(B³)
  * minimax enumeration then runs on grid-sized tables (B ≈ 100 ⇒ ~10⁵
  * intermediate rows — metadata scale, irrespective of data size). The
  * range-condition joins below are over these grid-sized tables only.
  *
  * EXACTNESS: window means are rationals; each is floored to MICROS before
  * the max/min. Because flooring is monotone, max∘floor = floor∘max and
  * min∘floor = floor∘min — so the result is EXACTLY ⌊10⁶ · (true isotonic
  * fit)⌋, bit-identical on any engine, and still monotone. (Comparing raw
  * rationals inside SQL max/min would need cross-multiplied argmax — the
  * micros floor gives the same answer at reporting resolution for free.)
  *
  * Output per bucket: `(bucket, w, pos, fit_micros)` — `fit_micros` is the
  * calibrated positive rate ×10⁶, non-decreasing in `bucket`. */
object Calibration {

  /** Isotonic fit of `labelCol` (0/1) against `bucketCol` (integer score
    * bucket) in `df`. Buckets absent from the data simply don't appear
    * (PAVA pools observed buckets only).
    *
    * `maxBuckets` is a LOUD guard on the O(B³) enumeration: passing a raw
    * continuous score as the bucket column would silently make B
    * data-sized and the cube catastrophic — the guard costs one count over
    * the already-aggregated bucket table and throws instead. Bucket your
    * score first (that IS the operator's contract). */
  def isotonicFit(df: DataFrame, bucketCol: String, labelCol: String,
                  maxBuckets: Long = 1024L): DataFrame = {
    val buckets = df.groupBy(col(bucketCol).cast("long").as("b"))
      .agg(count(lit(1)).as("w"), sum(col(labelCol).cast("long")).as("pos"))
    val nB = buckets.count()
    require(nB <= maxBuckets,
      s"isotonicFit: $nB distinct buckets exceeds maxBuckets=$maxBuckets — " +
        "the O(B^3) minimax cube needs a BUCKETED score; bin it first")
    // prefix sums over the bucket grid (allowlisted grid-sized window),
    // with an l = 0 sentinel so windows starting at the first bucket exist
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("b")).rowsBetween(Long.MinValue, 0)
    val prefix = buckets
      .withColumn("sw", sum(col("w")).over(w))
      .withColumn("sp", sum(col("pos")).over(w))
      .withColumn("rank", count(lit(1)).over(w))
      .select(col("b"), col("rank"), col("sw"), col("sp"))
    val sentinel = prefix.sparkSession.sql(
      "SELECT CAST(NULL AS BIGINT) b, CAST(0 AS BIGINT) rank, " +
        "CAST(0 AS BIGINT) sw, CAST(0 AS BIGINT) sp")
    val p = prefix.unionByName(sentinel)
    // window means in micros for every (l < j) prefix pair
    val pj = p.as("l")
      .join(prefix.as("j"), expr("l.rank < j.rank"))
      .select(col("l.rank").as("lr"), col("j.rank").as("jr"),
        expr("(j.sp - l.sp) * 1000000 DIV (j.sw - l.sw)").as("mean_micros"))
    // ŷᵢ = min_{j≥i} max_{l<i} mean(l..j): group the cube twice
    val idx = prefix.select(col("b"), col("rank").as("ir"),
      col("sw"), col("sp"))
    val inner = idx.join(pj, expr("lr < ir AND jr >= ir"))
      .groupBy(col("b"), col("ir"), col("jr"))
      .agg(max(col("mean_micros")).as("mm"))
    inner.groupBy(col("b")).agg(min(col("mm")).as("fit_micros"))
      .join(buckets, Seq("b"))
      .select(col("b"), col("w"), col("pos"), col("fit_micros"))
  }

  /** Reliability-diagram bins + the exact micro-ECE numerator for a
    * permille-scored binary classifier (Guo et al. 2017's expected
    * calibration error, computed without floats): bucket confidences into
    * `bins` equal-width bins, and per bin emit `n`, positives, the summed
    * confidence, and the cross-multiplied calibration gap
    * `|1000·Σy − Σscore_permille|`. Σ gaps over bins is the micro-ECE
    * numerator — ECE = Σ_b (n_b/N)·|acc_b − conf_b| = Σ_b gap_b / (1000·N)
    * — so every reported cell is an integer with no engine-variant float
    * association, and the consumer's one division is presentation.
    *
    * Scale: a single map-side-combinable groupBy to ≤`bins` rows; nothing
    * else touches the data. `scorePermilleCol` must already be an integer
    * confidence in [0, 1000) (that is the operator's contract — same
    * bucketed-input discipline as [[isotonicFit]]). */
  def eceBins(df: DataFrame, scorePermilleCol: String, labelCol: String,
              bins: Int = 10): DataFrame = {
    require(bins >= 1 && 1000 % bins == 0,
      s"eceBins: bins must divide 1000, got $bins")
    val width = 1000 / bins
    df.select(expr(s"$scorePermilleCol DIV $width").as("bin"),
        col(scorePermilleCol).cast("long").as("__sp"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(col("__sp")).as("sum_conf_permille"))
      .withColumn("gap",
        abs(lit(1000L) * col("n_pos") - col("sum_conf_permille")))
  }
}
