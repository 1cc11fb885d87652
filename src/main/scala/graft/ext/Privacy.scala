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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007 — public
    * literature) for an ORDERED sensitive attribute — the third leg of the
    * release-audit family (k-anonymity q284 counts group sizes, l-diversity
    * q286 counts distinct sensitive values; both pass on a group whose
    * sensitive DISTRIBUTION still leaks, e.g. 95% of one nation's customers
    * in the bottom balance band — exactly what t-closeness catches).
    *
    * Per QI group g: EMD(P_g, P_global) under the ordered-distance ground
    * metric = `(1/(m−1)) · Σ_j |CumP_g(j) − CumP(j)|`. Never leaves
    * integers: the comparison is cross-multiplied to
    *
    *   emd_num(g) = Σ_j |cum_g(j)·N − cum(j)·n_g|      (exact BIGINT)
    *   violation ⟺ 1000·emd_num > t_permille·n_g·N·(m−1)
    *
    * Overflow bound: cum ≤ N, so each term ≤ N² and the sum ≤ m·N² — with
    * 10 bands safe to N ≈ 3·10⁸ rows; lift to DECIMAL(38,0) past that (the
    * spearman discipline).
    *
    * Scale: one groupBy to (QI, band) counts (map-side combinable), the
    * m-band grid rebuilt per group from the `bandDomain` literal (missing
    * bands MUST contribute zero mass to the cumsum — joining only observed
    * bands understates EMD), per-group cumsum windows over m rows, and the
    * band-level global distribution broadcast. No shuffle wider than the
    * (QI, band) count table.
    *
    * Output: one row per QI group:
    * `(qiCols…, n_g, emd_num, emd_denom, t_violation)` where
    * `emd_denom = n_g·N·(m−1)` (the exact rational's denominator rides
    * along so no engine divides). */
  def tClosenessAudit(df: DataFrame, qiCols: Seq[String], bandCol: String,
                      bandDomain: Seq[Long], tPermille: Long): DataFrame = {
    require(qiCols.nonEmpty, "Privacy.tClosenessAudit: need at least one QI column")
    require(bandDomain.nonEmpty && bandDomain == bandDomain.sorted && bandDomain.distinct == bandDomain,
      "Privacy.tClosenessAudit: bandDomain must be sorted distinct band ids")
    require(tPermille >= 0 && tPermille <= 1000,
      s"Privacy.tClosenessAudit: tPermille must be in [0, 1000], got $tPermille")
    val m = bandDomain.size
    val qi = qiCols.map(col)
    val counts = df.groupBy(qi :+ col(bandCol).as("__band"): _*)
      .agg(count(lit(1)).as("__c"))
    // observed bands outside the declared domain would silently vanish from
    // the grid join — fail loudly instead (the domain is part of the contract)
    val domainLit = typedlit(bandDomain)
    val checked = counts.withColumn("__c",
      when(array_contains(domainLit, col("__band")), col("__c"))
        .otherwise(raise_error(concat(
          lit("Privacy.tClosenessAudit: band outside domain: "),
          col("__band").cast("string")))))
    val groups = checked.groupBy(qi: _*).agg(sum(col("__c")).as("n_g"))
    val grid = groups
      .select(qi :+ explode(domainLit).as("__band"): _*)
      .join(checked, qiCols :+ "__band", "left")
      .na.fill(0L, Seq("__c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(qi: _*).orderBy(col("__band"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // The global distribution is m rows — index metadata, collected like the
    // BPE merge table; its running sum becomes a plan literal, so no global
    // window ever appears in the distributed plan.
    val globalBands = df.groupBy(col(bandCol).as("__band"))
      .agg(count(lit(1)).as("__gc"))
      .collect().map(r => r.getAs[Long]("__band") -> r.getAs[Long]("__gc")).toMap
    val cumAll: Seq[Long] = bandDomain
      .scanLeft(0L)((acc, b) => acc + globalBands.getOrElse(b, 0L)).tail
    val nTotal = globalBands.values.sum
    val cumAllCol = element_at(typedlit(cumAll),
      (array_position(typedlit(bandDomain), col("__band"))).cast("int"))
    grid
      .withColumn("__cum_g", sum(col("__c")).over(wCum))
      .withColumn("__cum_all", cumAllCol)
      .join(groups, qiCols)
      .groupBy(qi :+ col("n_g"): _*)
      .agg(sum(abs(col("__cum_g") * lit(nTotal) - col("__cum_all") * col("n_g")))
        .as("emd_num"))
      .withColumn("emd_denom", col("n_g") * lit(nTotal) * lit((m - 1).toLong))
      .withColumn("t_violation",
        (lit(1000L) * col("emd_num") > lit(tPermille) * col("emd_denom"))
          .cast("int"))
  }
}
