package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Equi-width histogram of an integer column: `nBuckets` equal-width bins
    * spanning [min, max], bucket index
    * `(v − min) · nBuckets DIV (max − min + 1)` — pure integer arithmetic,
    * so bin edges are identical on every engine (float bin edges drift).
    * NULLs are excluded. Output: `(bucket, n_rows, lo, hi)` where lo/hi are
    * the observed extremes inside each bucket.
    *
    * Scale: one tiny min/max aggregate (broadcast back as a 1-row cross
    * join — not a driver collect, so the plan stays lazy end-to-end) plus
    * one scan + hash-aggregate over ≤ nBuckets groups: two passes total,
    * both map-side-combined, no wide shuffle. The standard profiling
    * histogram for a 100 TB column. Overflow bound: the bucket numerator is
    * `(max − min) · nBuckets`, which must fit a signed long — fine for any
    * real profiling width (e.g. a full 2⁴⁸ value range with 32k buckets);
    * a column actually spanning ~2⁶³ needs pre-scaling, not more buckets. */
  def histogram(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "histogram: nBuckets must be positive")
    val mm = df.filter(col(valueCol).isNotNull)
      .agg(min(col(valueCol)).as("__mn"), max(col(valueCol)).as("__mx"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(mm))
      // `__v` pins the value to a controlled name: the DIV expression never
      // embeds the caller's column name, so names needing backticks work.
      .withColumn("__v", col(valueCol))
      .withColumn("bucket",
        expr(s"((__v - __mn) * $nBuckets) DIV (__mx - __mn + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Distribution drift of an integer column between two snapshots — the
    * numeric monitoring twin of token drift (ext.TextAnalysis.tokenDrift):
    * both sides are bucketed with SHARED equi-width edges (joint min/max, the
    * [[histogram]] integer bucket formula), counts merged per bucket, and the
    * proportion shift reported as the cross-multiplied integer
    * `|cntA·totB − cntB·totA|` — never divides, so the drift ranking is
    * exact; consumers divide by `totA·totB` (or feed the counts to a PSI /
    * chi-squared routine) at their own precision. Output:
    * `(bucket, cnt_a, cnt_b, drift_scaled)`.
    *
    * Scale: one joint min/max (1-row broadcast), one scan + ≤nBuckets-group
    * aggregate per side, a bucket-keyed merge, 1-row totals broadcast — the
    * per-release "did the feature distribution move" gate for a 100 TB
    * column at two-scans cost. Same int64 bounds as [[histogram]] plus
    * `cnt·tot < 2⁶³` from tokenDrift. */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
                     nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "histogramDrift: nBuckets must be positive")
    val va = a.filter(col(valueCol).isNotNull).select(col(valueCol).as("__v"))
    val vb = b.filter(col(valueCol).isNotNull).select(col(valueCol).as("__v"))
    val mm = va.unionByName(vb)
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"))
    def counts(v: DataFrame, as: String) = v.crossJoin(broadcast(mm))
      .withColumn("bucket",
        expr(s"((__v - __mn) * $nBuckets) DIV (__mx - __mn + 1)"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    val merged = counts(va, "cnt_a")
      .join(counts(vb, "cnt_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val totals = merged.agg(sum(col("cnt_a")).as("__ta"),
      sum(col("cnt_b")).as("__tb"))
    merged.crossJoin(broadcast(totals))
      .withColumn("drift_scaled",
        abs(col("cnt_a") * col("__tb") - col("cnt_b") * col("__ta")))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"), col("drift_scaled"))
  }

  /** One-pass sufficient statistics for correlation / simple regression per
    * group: `(n, Σx, Σy, Σx², Σy², Σxy)` over two integer-typed columns.
    * Pearson r, OLS slope/intercept, and variances all derive from these six
    * numbers downstream — shipping the sufficient statistics instead of the
    * final ratio keeps the aggregate EXACT and engine-portable (the division
    * is the consumer's choice of precision, not baked into stored output).
    *
    * Scale: a single map-side-combined hash aggregate — the cheapest possible
    * shape. Overflow bound: Σx² fits int64 while `n · max(x)² < 2⁶³`
    * (~10⁹ rows of 5-digit values); beyond that, cast the products to
    * `decimal(38,0)` for the same plan at ~2× the aggregation cost. */
  def sufficientStats(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val x = col(xCol).cast("long"); val y = col(yCol).cast("long")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sum_x"), sum(y).as("sum_y"),
        sum(x * x).as("sum_xx"), sum(y * y).as("sum_yy"),
        sum(x * y).as("sum_xy"))
  }

  /** Grouped simple linear regression — the consumer [[sufficientStats]]
    * anticipates: per group, the exact OLS slope and intercept of y on x,
    *   slope = (n·Σxy − Σx·Σy) / (n·Σxx − (Σx)²),
    *   intercept = (Σy − slope·Σx) / n = (Σy·den − num·Σx) / (n·den),
    * reported as micro-unit integers via integer division. The products run
    * in `decimal(38,0)` — n·Σxy·10⁶ overflows int64 around 10⁵ rows/group of
    * 5-digit values, and a float pipeline's last-ulp drift differs between
    * engines; 38-digit exact integers do neither. Groups with zero x
    * variance (den = 0: fewer than 2 points, or constant x) emit NULL slope
    * and intercept rather than a division error.
    *
    * Output: `(group, n, slope_micro, intercept_micro)`.
    *
    * Scale: identical to [[sufficientStats]] — ONE map-side-combined hash
    * aggregate; the ratio arithmetic happens on the group-sized result. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame =
    sufficientStats(df, groupCol, xCol, yCol)
      .select(col(groupCol), col("n"),
        expr("CAST(n AS DECIMAL(38,0))").as("__n"),
        expr("CAST(sum_x AS DECIMAL(38,0))").as("__sx"),
        expr("CAST(sum_y AS DECIMAL(38,0))").as("__sy"),
        expr("CAST(sum_xx AS DECIMAL(38,0))").as("__sxx"),
        expr("CAST(sum_xy AS DECIMAL(38,0))").as("__sxy"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .select(col(groupCol), col("n"),
        when(col("__den") =!= 0,
          expr("CAST((1000000 * __num) DIV __den AS BIGINT)"))
          .as("slope_micro"),
        when(col("__den") =!= 0,
          expr("CAST((1000000 * (__sy * __den - __num * __sx)) DIV (__n * __den) AS BIGINT)"))
          .as("intercept_micro"))

  /** Benford's-law expected first-digit frequencies, per-mille (log10(1+1/d)
    * rounded — irrational, so BOTH engines consume this shared constant
    * table rather than computing logs). */
  val BenfordPermille: Seq[(Int, Long)] =
    Seq(1 -> 301L, 2 -> 176L, 3 -> 125L, 4 -> 97L, 5 -> 79L,
      6 -> 67L, 7 -> 58L, 8 -> 51L, 9 -> 46L)

  /** Benford first-digit audit — the fabricated-numbers screen: natural
    * multi-scale amounts follow log-uniform leading digits; invented ones
    * cluster. Per digit: observed count, observed per-mille, the expected
    * per-mille, and a chi-square-style deviation term
    * `⌊10⁶·(1000·obs − exp·N)²/(1000·exp·N)⌋` — all integer (decimal for
    * the square), so the audit hashes identically on any engine. The
    * deviation terms sum to 10³·χ² downstream if a single statistic is
    * wanted.
    *
    * `valueCents` must be a positive integer column (leading digit of the
    * decimal representation). Output: one row per digit 1–9.
    *
    * Scale: one map-side-combined digit groupBy + a broadcast 9-row
    * constant join. */
  def benfordAudit(df: DataFrame, valueCents: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = BenfordPermille.toDF("digit", "expected_permille")
    val obs = df.select(valueCents.as("__v"))
      .filter(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val total = obs.agg(sum(col("n_obs")).as("__n"))
    broadcast(expected).join(obs, Seq("digit"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"), col("expected_permille"),
        expr("1000L * n_obs DIV __n").as("observed_permille"),
        expr("CAST((1000000 * CAST(1000 * n_obs - expected_permille * __n AS DECIMAL(38,0)) " +
          "* (1000 * n_obs - expected_permille * __n)) " +
          "DIV (1000 * expected_permille * __n) AS BIGINT)").as("chi_term_micro"))
  }

  /** Audience-overlap matrix: pairwise Jaccard of the ENTITY sets behind
    * each category — "how much do the click and view audiences overlap".
    * Intersections come from per-entity distinct category SETS exploded into
    * pairs (bounded by the category alphabet squared per entity — no
    * category×category self-join of the activity table); sizes from one
    * distinct count. `jaccard_milli = ⌊1000·|A∩B| / (|A|+|B|−|A∩B|)⌋`,
    * integer division.
    *
    * Output: `(cat_a < cat_b, n_a, n_b, n_both, jaccard_milli)`.
    *
    * Scale: distinct (entity, category) is activity-sized and map-side
    * combined; the pair explode is alphabet-bounded per entity; category
    * sizes broadcast into the pair table. */
  def audienceOverlap(df: DataFrame, entityCol: Column, categoryCol: Column): DataFrame = {
    val ec = df.select(entityCol.as("__e"), categoryCol.as("__c")).distinct()
    val sizes = ec.groupBy(col("__c")).agg(count(lit(1)).as("__n"))
    val pairs = ec.groupBy(col("__e"))
      .agg(array_sort(collect_set(col("__c"))).as("__cs"))
      .filter(size(col("__cs")) >= 2)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(__cs) - 1), " +
          "i -> transform(slice(__cs, i + 1, size(__cs) - i), " +
          "y -> struct(element_at(__cs, i) AS a, y AS b))))")).as("p"))
      .groupBy(col("p.a").as("cat_a"), col("p.b").as("cat_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("__c").as("cat_a"), col("__n").as("n_a"))), "cat_a")
      .join(broadcast(sizes.select(col("__c").as("cat_b"), col("__n").as("n_b"))), "cat_b")
      .select(col("cat_a"), col("cat_b"), col("n_a"), col("n_b"), col("n_both"),
        expr("1000L * n_both DIV (n_a + n_b - n_both)").as("jaccard_milli"))
  }

  /** Grouped TWO-feature linear regression `y = b0 + b1·x1 + b2·x2` — the
    * normal equations solved exactly per group via Cramer's rule on the 3×3
    * moment matrix, all in decimal(38,0): each coefficient is a ratio of two
    * integer determinants, reported in micro-units by integer division. The
    * multi-feature extension of [[groupedOls]]; like it, everything reduces
    * to ONE map-side-combined aggregate of sufficient statistics — the model
    * fit costs the same scan as a count. Groups with a singular moment
    * matrix (collinear or constant features, n < 3) emit NULLs.
    *
    * Magnitude bound: the determinant products stay under 10³⁸ up to ~10⁶
    * rows/group of 5-digit features; the DuckDB mirror computes the same
    * integers in HUGEINT.
    *
    * Output: `(group, n, b0_micro, b1_micro, b2_micro)`. */
  def groupedOls2(df: DataFrame, groupCol: String, x1Col: String,
                  x2Col: String, yCol: String): DataFrame = {
    val x1 = col(x1Col).cast("long"); val x2 = col(x2Col).cast("long")
    val y = col(yCol).cast("long")
    val sums = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x2 * x2).as("s22"), sum(x1 * x2).as("s12"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    val dec = Seq("n", "s1", "s2", "sy", "s11", "s22", "s12", "s1y", "s2y")
      .map(c => expr(s"CAST($c AS DECIMAL(38,0))").as(s"__$c"))
    sums.select(col(groupCol) +: col("n") +: dec: _*)
      .withColumn("__det", expr(
        "__n * (__s11 * __s22 - __s12 * __s12) " +
          "- __s1 * (__s1 * __s22 - __s12 * __s2) " +
          "+ __s2 * (__s1 * __s12 - __s11 * __s2)"))
      .withColumn("__det0", expr(
        "__sy * (__s11 * __s22 - __s12 * __s12) " +
          "- __s1 * (__s1y * __s22 - __s12 * __s2y) " +
          "+ __s2 * (__s1y * __s12 - __s11 * __s2y)"))
      .withColumn("__det1", expr(
        "__n * (__s1y * __s22 - __s12 * __s2y) " +
          "- __sy * (__s1 * __s22 - __s12 * __s2) " +
          "+ __s2 * (__s1 * __s2y - __s1y * __s2)"))
      .withColumn("__det2", expr(
        "__n * (__s11 * __s2y - __s1y * __s12) " +
          "- __s1 * (__s1 * __s2y - __s1y * __s2) " +
          "+ __sy * (__s1 * __s12 - __s11 * __s2)"))
      .select(col(groupCol), col("n"),
        when(col("__det") =!= 0,
          expr("CAST((1000000 * __det0) DIV __det AS BIGINT)")).as("b0_micro"),
        when(col("__det") =!= 0,
          expr("CAST((1000000 * __det1) DIV __det AS BIGINT)")).as("b1_micro"),
        when(col("__det") =!= 0,
          expr("CAST((1000000 * __det2) DIV __det AS BIGINT)")).as("b2_micro"))
  }

  /** Welch's t² per group for an A/B comparison — the unequal-variance test
    * statistic, squared so it stays RATIONAL (t itself needs a square root;
    * t² = (m̄ₐ−m̄ᵦ)²/(s²ₐ/nₐ+s²ᵦ/nᵦ) is a ratio of integers). After clearing
    * denominators and cancelling the common (nₐ·nᵦ)² factor,
    *   t² = (Sₐ·nᵦ − Sᵦ·nₐ)²·(nₐ−1)·(nᵦ−1) /
    *        [(nₐ·SSₐ−Sₐ²)·nᵦ²·(nᵦ−1) + (nᵦ·SSᵦ−Sᵦ²)·nₐ²·(nₐ−1)]
    * — reported as `t2_micro = ⌊10⁶·t²⌋` via decimal(38,0) integer
    * arithmetic (exact and engine-portable; fits 38 digits up to ~10⁴ groups
    * of 10⁶ five-digit values). The consumer compares t2_micro against the
    * squared critical value; NULL when either side has <2 points or the
    * pooled variance term is zero.
    *
    * Both samples aggregate in ONE conditional pass (no per-label scan).
    * Output: `(group, n_a, n_b, t2_micro)`. Scale: a single map-side
    * combined hash aggregate. */
  def welchTSquared(df: DataFrame, groupCol: String, labelCol: String,
                    valueCol: String, labelA: String, labelB: String): DataFrame = {
    val v = col(valueCol).cast("long")
    def side(l: String, tag: String) = Seq(
      sum(when(col(labelCol) === l, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(col(labelCol) === l, v).otherwise(0L)).as(s"s_$tag"),
      sum(when(col(labelCol) === l, v * v).otherwise(0L)).as(s"ss_$tag"))
    val aggs = side(labelA, "a") ++ side(labelB, "b")
    df.groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol), col("n_a"), col("n_b"),
        expr("CAST(n_a AS DECIMAL(38,0))").as("__na"),
        expr("CAST(n_b AS DECIMAL(38,0))").as("__nb"),
        expr("CAST(s_a AS DECIMAL(38,0))").as("__sa"),
        expr("CAST(s_b AS DECIMAL(38,0))").as("__sb"),
        expr("CAST(ss_a AS DECIMAL(38,0))").as("__ssa"),
        expr("CAST(ss_b AS DECIMAL(38,0))").as("__ssb"))
      .withColumn("__num", expr(
        "(__sa * __nb - __sb * __na) * (__sa * __nb - __sb * __na) * (__na - 1) * (__nb - 1)"))
      .withColumn("__den", expr(
        "(__na * __ssa - __sa * __sa) * __nb * __nb * (__nb - 1) + " +
          "(__nb * __ssb - __sb * __sb) * __na * __na * (__na - 1)"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        when(col("n_a") >= 2 && col("n_b") >= 2 && col("__den") =!= 0,
          expr("CAST((1000000 * __num) DIV __den AS BIGINT)")).as("t2_micro"))
  }

  /** Concentration (Herfindahl–Hirschman) of an entity distribution per key:
    * `hhi_micro = ⌊10⁶·Σ(cᵤ/n)²⌋` — 10⁶ when one entity owns every row,
    * →10⁶/n_entities when uniform. The skew gauge for "is this event type /
    * partition / customer segment dominated by a few actors", computed as
    * exact integers (counts squared, one final integer division).
    *
    * Output: `(key, n_entities, n_rows, hhi_micro)`. Scale: two strict
    * key-coarsening hash aggregates ((key,entity) → key), both map-side
    * combined. */
  def concentration(df: DataFrame, keyCol: String, entityCol: String): DataFrame =
    df.groupBy(col(keyCol), col(entityCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_entities"), sum(col("__c")).as("n_rows"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __c")).as("__sq"))
      .select(col(keyCol), col("n_entities"), col("n_rows"),
        expr("CAST((1000000 * __sq) DIV (CAST(n_rows AS DECIMAL(38,0)) * n_rows) AS BIGINT)")
          .as("hhi_micro"))

  /** Quantile binning: assign each row its `nBins`-quantile bin (1-based)
    * WITHIN a stratum — the feature-bucketing pass behind "quality deciles
    * per language" style corpus reports. The `(value, id)` ordering makes the
    * rank total, so bin assignment is deterministic and engine-portable
    * (NTILE over a total order is exact; no interpolation is involved).
    *
    * Scale: one shuffle on the stratum key; each stratum's window is
    * independent. A single dominant stratum serializes its partition — for
    * GLOBAL deciles over a 100 TB column use the sketch path
    * (`approx_percentile` cutpoints, q57) instead of a one-partition window. */
  def rankBins(df: DataFrame, stratum: String, valueCol: String, idCol: String,
               nBins: Int): DataFrame = {
    require(nBins > 0, "rankBins: nBins must be positive")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("bin", ntile(nBins).over(
      Window.partitionBy(col(stratum)).orderBy(col(valueCol), col(idCol)))
      .cast("long"))
  }

  /** Winsorized (tail-clipped) per-group sums — the robust-statistics pass a
    * pipeline runs when a handful of corrupt extreme values would otherwise
    * dominate a mean: clamp each value into the group's
    * [pLowPct, pHighPct] percentile band, then aggregate the clamped values.
    *
    * Percentile bounds are EXACT and engine-portable: rows are ranked
    * `row_number() over (partition by group order by value, id)` (the id
    * tie-break makes the rank total and deterministic), and the bound
    * indices use pure integer ceiling `(p·n + 99) DIV 100` — no float
    * interpolation, so DuckDB/Spark/anything agree bit-for-bit (quantile
    * INTERPOLATION differs across engines; rank selection does not).
    *
    * `valueCol` must be integer-typed (cents-style). Output per group:
    * `(n_rows, lo_val, hi_val, wins_sum)`.
    *
    * Scale: ONE shuffle on the group key (the rank window); the bounds
    * aggregation reuses that partitioning, and the per-group bounds table
    * (|groups| rows) broadcasts back onto the ranked rows. A skewed group
    * serializes its window partition — for power-law groups pre-aggregate
    * with [[graft.ext.Sampling.stratifiedSample]] or switch to the sketch
    * path (`approx_percentile`, q57) and accept approximate bounds. */
  def winsorizedSums(df: DataFrame, groupCol: String, valueCol: String,
                     idCol: String, pLowPct: Int = 1, pHighPct: Int = 99): DataFrame = {
    require(0 < pLowPct && pLowPct < pHighPct && pHighPct <= 100,
      s"winsorizedSums: need 0 < pLowPct < pHighPct <= 100, got ($pLowPct, $pHighPct)")
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(groupCol), col(valueCol), col(idCol))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val bounds = ranked.groupBy(col(groupCol))
      .agg(
        min(when(col("__rn") === expr(s"($pLowPct * __n + 99) DIV 100"), col(valueCol)))
          .as("lo_val"),
        min(when(col("__rn") === expr(s"($pHighPct * __n + 99) DIV 100"), col(valueCol)))
          .as("hi_val"))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        min(col("lo_val")).as("lo_val"),
        max(col("hi_val")).as("hi_val"),
        sum(least(greatest(col(valueCol), col("lo_val")), col("hi_val"))).as("wins_sum"))
  }

  /** Categorical-distribution drift between two slices as ADD-ONE-smoothed
    * KL divergence in exact integer micro-nats, BOTH directions (KL is
    * asymmetric; a category vanishing from `b` shows loudest in kl_ab).
    * The categorical complement to [[graft.ext.Rank.ksDrift]]'s numeric KS
    * statistic — the daily "did the event mix shift / did a logger break"
    * monitor.
    *
    * Per-category term: `p̂·ln(p̂/q̂)` with `p̂ = (c_a+1)/(t_a+K)`, rounded to
    * integer micros per category BEFORE summing (ROUND(ln·1e6) contract →
    * order-independent, engine-exact). Output one row:
    * `(n_a, n_b, n_categories, kl_ab_micros, kl_ba_micros)`.
    *
    * Scale: two map-side-combinable groupBys to the category alphabet, a
    * full outer join of two alphabet-sized tables, one broadcast one-row
    * total — nothing data-sized past the first aggregation. */
  def klDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    def cnt(df: DataFrame, out: String) =
      df.groupBy(col(catCol).as("cat")).agg(count(lit(1)).as(out))
    val merged = cnt(a, "__ca").join(cnt(b, "__cb"), Seq("cat"), "full")
      .select(col("cat"), coalesce(col("__ca"), lit(0L)).as("ca"),
        coalesce(col("__cb"), lit(0L)).as("cb"))
    val tot = merged.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"),
      count(lit(1)).as("k"))
    def term(x: String, tx: String, y: String, ty: String) =
      s"CAST(ROUND(1e6 * (($x + 1e0) / ($tx + k)) * " +
        s"ln((($x + 1e0) * ($ty + k)) / (($tx + k) * ($y + 1e0)))) AS BIGINT)"
    merged.crossJoin(broadcast(tot))
      .select(col("ta"), col("tb"), col("k"),
        expr(term("ca", "ta", "cb", "tb")).as("__tab"),
        expr(term("cb", "tb", "ca", "ta")).as("__tba"))
      .groupBy(col("ta"), col("tb"), col("k"))
      .agg(sum(col("__tab")).as("kl_ab_micros"), sum(col("__tba")).as("kl_ba_micros"))
      .select(col("ta").as("n_a"), col("tb").as("n_b"),
        col("k").as("n_categories"), col("kl_ab_micros"), col("kl_ba_micros"))
  }

  /** Missing-value imputation with the per-group EXACT lower median — the
    * repair pass run before a numeric column feeds features or KPIs: NULLs
    * in `valueCol` are replaced by the median of the group's non-null
    * values. The lower median (value at rank `(n+1) DIV 2` of the total
    * order `(value, id)`) keeps imputation integer-exact and
    * engine-portable — no midpoint interpolation, same rank arithmetic as
    * [[winsorizedSums]].
    *
    * Output: the input rows plus `(imputed_flag, value_filled)`; groups with
    * NO non-null values keep NULL (nothing defensible to impute).
    *
    * Scale: one shuffle on the group key for the rank window over NON-NULL
    * rows only, a |groups|-sized median table broadcast back — the join adds
    * no shuffle. A dominant group serializes its window partition; at that
    * point swap in the sketch median (`approx_percentile`, q57) or
    * [[percentileSketchTable]] for the same repair at declared
    * quantization. */
  def imputeGroupMedian(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nn = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol), col(idCol))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val medians = nn.filter(col("__rn") === expr("(__n + 1) DIV 2"))
      .select(col(groupCol), col(valueCol).as("__med"))
    df.join(broadcast(medians), Seq(groupCol), "left")
      .withColumn("imputed_flag", col(valueCol).isNull && col("__med").isNotNull)
      .withColumn("value_filled", coalesce(col(valueCol), col("__med")))
      .drop("__med")
  }

  /** Mergeable percentile PRE-AGGREGATION (the HdrHistogram pattern): count
    * rows per `(group, bucket)` where `bucket = value DIV bucketWidth` —
    * pure integer arithmetic, so the table is bit-identical on every engine.
    *
    * This is the percentile analog of the q109 HLL sketch table: build it
    * once per partition/day/group, then answer "p99 over ANY subset of
    * groups" by summing bucket counts ([[percentilesFromSketch]]) — no
    * re-scan of raw data, and unlike a t-digest the merge is plain integer
    * addition with NO approximation beyond the declared quantization (the
    * answer is exact to ±bucketWidth, a bound chosen up front rather than a
    * data-dependent sketch error). `valueCol` must be integer-typed and
    * non-negative (cents-style).
    *
    * Scale: one map-side-combined hash aggregate; output size is
    * |groups| · (range/bucketWidth) — metadata, independent of row count. */
  def percentileSketchTable(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "percentileSketchTable: bucketWidth must be positive")
    val bucket = df.filter(col(valueCol).isNotNull)
      .withColumn("__v", col(valueCol)) // pinned name: backtick-hostile safe
      .withColumn("bucket", expr(s"__v DIV $bucketWidth"))
    bucket.groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Exact rank-percentiles over a MERGED [[percentileSketchTable]]: sum the
    * bucket counts of every row in `table` (the caller pre-filters to the
    * group subset of interest), cumulate over buckets, and for each
    * percentile `p` return the first bucket whose cumulative count reaches
    * `ceil(p% · total)` — integer ceiling `(tot·p + 99) DIV 100`, no float
    * interpolation, so any engine replays it bit-for-bit. Output:
    * `(pct, bucket, lo_value = bucket · bucketWidth)` per requested pct.
    *
    * Scale: the merge is a hash aggregate over bucket ids; the cumulative
    * window then runs on the MERGED bucket table, whose size is
    * range/bucketWidth — bounded by the quantization choice, NOT by data
    * volume (4k rows for a $0–$4M range at $1k buckets), so the
    * single-partition window is over metadata, the same class as the IVF
    * centroid table. That boundedness is the whole design: the one
    * unavoidable sequential step (cumulating) runs on the sketch, never the
    * data. */
  def percentilesFromSketch(table: DataFrame, pcts: Seq[Int],
                            bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentilesFromSketch: pcts must be within [1, 100]")
    import org.apache.spark.sql.expressions.Window
    val spark = table.sparkSession
    import spark.implicits._
    val merged = table.groupBy(col("bucket")).agg(sum(col("n")).as("n"))
    val cum = merged
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(merged.agg(sum(col("n")).as("tot"))))
    cum.join(broadcast(pcts.toDF("pct")),
        col("cum") >= expr("(tot * pct + 99) DIV 100"))
      .groupBy(col("pct"))
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("lo_value", col("bucket") * lit(bucketWidth))
  }

  /** Key-cardinality histogram — the skew FINGERPRINT taken before
    * committing to a join or aggregation strategy (q137 sizes a specific
    * join; q110 salts a known-skewed key; this answers "is the key skewed
    * at all, and how"): for each rows-per-key count, how many keys have it.
    * Two map-side-combined aggregates; the output is distribution-sized
    * (distinct multiplicities), metadata in practice. A heavy tail here →
    * salting/AQE-skew-join; a flat top → broadcast or bucketed plans. */
  def keyCardinalityHistogram(df: DataFrame, keyCol: Column): DataFrame =
    df.groupBy(keyCol.as("__k"))
      .agg(count(lit(1)).as("rows_per_key"))
      .groupBy(col("rows_per_key"))
      .agg(count(lit(1)).as("n_keys"))

  /** Pearson χ² test of independence between two categorical columns — the
    * drift/association question ("does event mix depend on weekday?",
    * "is label distribution independent of source?") answered WITHOUT logs
    * (G-tests and mutual information need `ln`, which is irrational and
    * engine-divergent; χ² is a sum of rationals).
    *
    * Statistic, micro-scaled with per-cell truncation so any engine lands on
    * the same integer: `chi2_micro = Σ_ij ⌊10⁶·(N·O_ij − R_i·C_j)² /
    * (N·R_i·C_j)⌋` over the FULL margin grid (absent cells contribute their
    * expected mass — a contingency built only from observed pairs understates
    * χ²). All arithmetic in DECIMAL(38,0); exact for N ≤ 10⁷ rows
    * (10⁶·(N·O)² ≤ 10³⁴), and the one-row total GUARDS that bound with
    * `raise_error` rather than silently wrapping — past it, pre-aggregate or
    * sample (at 10⁷ rows any real dependence is already astronomically
    * significant).
    *
    * Output: one row `(n_row_levels, n_col_levels, n, dof, chi2_micro)`.
    *
    * Scale: one map-side-combined (row, col) count; margins are strict
    * coarsenings of it; the grid is levels×levels (alphabet-sized — both
    * margin frames broadcast), left-joined against the observed cells. */
  def chiSquareIndependence(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val obs = df.groupBy(rowCol.as("__r"), colCol.as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rm = obs.groupBy(col("__r")).agg(sum(col("__o")).as("__rn"))
    val cm = obs.groupBy(col("__c")).agg(sum(col("__o")).as("__cn"))
    val tot = obs.agg(sum(col("__o")).as("__n"))
    rm.crossJoin(broadcast(cm)).crossJoin(broadcast(tot))
      .join(obs, Seq("__r", "__c"), "left")
      .na.fill(0L, Seq("__o"))
      .withColumn("__ok",
        when(col("__n") <= 10000000L, true)
          .otherwise(raise_error(concat(lit(
            "Profile.chiSquareIndependence: n = "), col("__n"),
            lit(" exceeds the 10^7 exactness bound — pre-aggregate or sample")))))
      .filter(col("__ok"))
      .select(col("__r"), col("__c"),
        expr("CAST(__o AS DECIMAL(38,0))").as("od"),
        expr("CAST(__rn AS DECIMAL(38,0))").as("rnd"),
        expr("CAST(__cn AS DECIMAL(38,0))").as("cnd"),
        expr("CAST(__n AS DECIMAL(38,0))").as("nd"))
      .withColumn("__term", expr(
        "(1000000 * (nd * od - rnd * cnd) * (nd * od - rnd * cnd)) DIV (nd * rnd * cnd)"))
      .agg(
        countDistinct(col("__r")).as("n_row_levels"),
        countDistinct(col("__c")).as("n_col_levels"),
        max(expr("CAST(nd AS BIGINT)")).as("n"),
        sum(col("__term")).as("chi2_micro"))
      .withColumn("dof", expr("(n_row_levels - 1) * (n_col_levels - 1)"))
      .select(col("n_row_levels"), col("n_col_levels"), col("n"), col("dof"),
        col("chi2_micro"))
  }

  /** Order-independent table-content fingerprint — the migration / backfill /
    * compaction equality certificate: two tables hold the same MULTISET of
    * rows over `cols` iff their fingerprints match, with no sort, no join,
    * and no row shipped to the driver.
    *
    * One row `(n_rows, xor_h, sum_h)` over the portable per-row hash
    * `hash60(concat_ws(0x01, cols…))`:
    *   - `bit_xor` is order/partition-independent and overflow-free, but
    *     blind to rows duplicated an even number of times;
    *   - the DECIMAL(38,0) `sum` is also order-independent and catches the
    *     duplication-parity class XOR misses (equal sums AND equal xors AND
    *     equal counts from different multisets require engineered
    *     collisions);
    *   - `n_rows` anchors cardinality.
    *
    * The hash is [[graft.ext.PortableHash]]'s md5-60, so an independent
    * engine computes the identical certificate (q249's oracle). CALLER
    * CONTRACT: pass columns whose string rendering is engine-stable —
    * integers, strings, dates; never raw doubles (cast to cents first), and
    * pre-`coalesce` nullable columns (`concat_ws` SKIPS nulls on both
    * engines, which conflates null-position variants).
    *
    * Scale: one scan + one all-reduce to a single row — the cheapest
    * possible full-content check; shuffle bytes are one partial aggregate
    * per task. */
  def tableFingerprint(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(graft.ext.PortableHash.hash60(
        concat_ws("\u0001", cols.map(_.cast("string")): _*)).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h)").as("xor_h"),
        sum(col("__h").cast("decimal(38,0)")).as("sum_h"))
}
