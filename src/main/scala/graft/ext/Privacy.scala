package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Local differential privacy for categorical telemetry — generalized
  * randomized response (Warner 1965, JASA 60:63; the k-ary generalization
  * used by RAPPOR-style collectors): each record reports its TRUE category
  * with probability p and a uniformly random category otherwise, so no
  * individual report reveals its input (ε = ln(p·k/(1−p) + 1) per record),
  * yet aggregate frequencies remain recoverable by debiasing:
  *
  *   E[obsᶜ] = n·(p·πᶜ + (1−p)/k)  ⇒  n̂ᶜ = (obsᶜ − n(1−p)/k) / p
  *
  * DETERMINISM: the per-record "coins" are portable-hash draws
  * ([[PortableHash.hash60]] over salt:id), so the perturbation — normally
  * the one irreproducible step of an LDP pipeline — is replayable
  * arithmetically by the DuckDB oracle (q240) and the whole mechanism is
  * hash-verified end to end. A production deployment swaps the hash draw
  * for a real RNG at the CLIENT; every Spark-side shape below is unchanged.
  *
  * EXACTNESS: with p = keepPermille/1000, the debiased estimate is the
  * rational (1000·obsᶜ·k − (1000−keep)·n) / (keep·k). The NUMERATOR is
  * returned (`est_num`, BIGINT — the denominator keep·k is a per-call
  * constant) so no engine ever divides: trunc-vs-floor division of negative
  * numerators (possible when obsᶜ undershoots) is exactly where Spark `DIV`
  * and DuckDB `//` disagree.
  *
  * SCALE: one projection pass (hash + two pmods per row) and one groupBy on
  * k categories — fully codegen'd, no shuffle beyond the k-row aggregate.
  */
object Privacy {

  /** The reported (perturbed) category for `id`: keep `value` when
    * `hash(salt:coin:id) mod 1000 < keepPermille`, else the category at
    * index `hash(salt:pick:id) mod k` of `categories` (fixed public order —
    * pass them sorted so both engines agree). */
  def rrReport(
      id: Column, value: Column, categories: Seq[String],
      keepPermille: Int, salt: String): Column = {
    require(keepPermille > 0 && keepPermille < 1000,
      s"keepPermille must be in (0,1000), got $keepPermille")
    require(categories.nonEmpty && categories == categories.sorted,
      "categories must be non-empty and sorted (a public, engine-shared order)")
    val coin = pmod(PortableHash.hash60(concat(lit(s"$salt:coin:"), id.cast("string"))), lit(1000L))
    val pick = pmod(PortableHash.hash60(concat(lit(s"$salt:pick:"), id.cast("string"))), lit(categories.size.toLong))
    when(coin < keepPermille, value)
      .otherwise(element_at(array(categories.map(lit): _*), (pick + 1L).cast("int")))
  }

  /** Per-category observed report counts plus the debiased-estimate
    * numerator: `est_num = 1000·obs·k − (1000−keep)·n`, where the true-count
    * estimate is `est_num / (keep·k)` (left to the consumer — see scaladoc).
    * Categories with zero reports still appear (left join against the
    * public category list), since debiasing must subtract the noise floor
    * for them too. */
  def rrFrequencies(
      reports: DataFrame, reportCol: String, categories: Seq[String],
      keepPermille: Int): DataFrame = {
    val spark = reports.sparkSession
    import spark.implicits._
    val k = categories.size.toLong
    val obs = reports.groupBy(col(reportCol).as("category"))
      .agg(count(lit(1)).as("obs"))
    val catDf = categories.toDF("category")
    // n = Σ obs over the k-row table — one data pass total; the one-row
    // total re-joins via the broadcast re-wrap idiom (metadata-sized)
    val total = obs.agg(sum(col("obs")).as("n"))
    catDf.join(obs, Seq("category"), "left")
      .crossJoin(broadcast(total))
      .select(col("category"),
        coalesce(col("obs"), lit(0L)).as("obs"),
        (lit(1000L) * coalesce(col("obs"), lit(0L)) * lit(k)
          - lit(1000L - keepPermille) * col("n")).as("est_num"))
  }

  /** CENTRAL-DP histogram with discrete-Laplace (two-sided geometric) noise
    * at ε = 0.5 per category: noise = G₁ − G₂ with Gᵢ geometric, drawn by
    * inversion `⌊−2·ln(u)⌋` from portable-hash uniforms (u ∈ (0, 1], so the
    * log is finite; −2 = 1/ln(e^{−ε}) at ε = ½ — chosen so the inversion
    * constant is EXACT in binary and the draw replays bit-identically in
    * the oracle). As with [[report]], production swaps the hash draw for a
    * real RNG; every aggregate shape is unchanged, and the deterministic
    * form lets the oracle hash-verify the entire mechanism.
    *
    * Output per category: `(cat, n_true, n_noisy, abs_err)` — the utility
    * audit a DP release ships with (in the DP report itself `n_true` is of
    * course withheld; it is exposed here because the QUERY is the test
    * harness for the mechanism).
    *
    * Scale: one groupBy to the category alphabet; noise is two hash draws
    * per CATEGORY (not per row), the central-model shape. */
  def dpHistogram(df: DataFrame, catCol: String, salt: String = "dp"): DataFrame = {
    def geo(tag: String): Column = {
      val h = pmod(PortableHash.hash60(
        concat(lit(s"$salt:$tag:"), col("cat").cast("string"))), lit(1000000L))
      floor(lit(-2.0) * log((h + lit(1L)).cast("double") / lit(1000000.0)))
        .cast("long")
    }
    df.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as("n_true"))
      .select(col("cat"), col("n_true"),
        (col("n_true") + geo("p") - geo("n")).as("n_noisy"))
      .withColumn("abs_err", abs(col("n_noisy") - col("n_true")))
  }
}
