package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair and smoothing over keyed series — the
  * "make the sensor/usage table analyzable" passes that precede any
  * per-entity feature computation: densify missing periods, carry forward
  * the last observation, exponentially smooth.
  *
  * Everything here is per-key windowed (shuffles on the key, never a global
  * sort) and integer-exact (cents-style values, per-mille decay weights), so
  * results are deterministic and replayable bit-for-bit on any engine.
  */
object TimeSeries {

  /** Densify each key's series to EVERY integer time step in its observed
    * `[min, max]` span, then forward-fill missing values with the last
    * observation (the standard gap-fill + LOCF repair). Input must have at
    * most one row per `(key, time)` — pre-aggregate first. Output: the dense
    * grid with `was_gap` (no input row for this step — or a NULL input
    * value) and `value_filled` (LOCF; a key's leading value is never NULL
    * because the span starts at an observation).
    *
    * Scale: the span aggregate and the dense `sequence` explode both shuffle
    * on the key only; the LOCF window is key-partitioned. Generated rows per
    * key = its span length — bound the grid by choosing the time unit (days
    * here, not micros). */
  def gapFillForwardFill(df: DataFrame, keyCol: String, timeCol: String,
                         valueCol: String): DataFrame = {
    val span = df.groupBy(col(keyCol))
      .agg(min(col(timeCol)).as("__t0"), max(col(timeCol)).as("__t1"))
    val dense = span.select(col(keyCol),
      explode(sequence(col("__t0"), col("__t1"))).as(timeCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.join(df, Seq(keyCol, timeCol), "left")
      .withColumn("was_gap", col(valueCol).isNull)
      .withColumn("value_filled", last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Per-key exponentially weighted moving average, INTEGER-exact: the fold
    * `acc' = (decay·acc + (1000−decay)·x) DIV 1000` over the key's values in
    * `orderCols` order, seeded with the first value. Per-mille weights and
    * integer division make the fixpoint identical on every engine — a float
    * EWMA replayed in a different association order drifts in the last ulp.
    * Output: `(key, n_points, ewma)`.
    *
    * Scale: one shuffle (the groupBy); the fold runs on a per-key collected
    * array, so per-key cardinality must be bounded — for unbounded streams
    * bucket the key by day first (the sketch-table pattern) or move to
    * `flatMapGroupsWithState`, which keeps the same integer recurrence as
    * running state. Overflow bound: `decay · acc` must fit int64 — values up
    * to ~9·10¹⁵ at per-mille weights. */
  def ewmaPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, decayPerMille: Long = 850L): DataFrame = {
    require(decayPerMille >= 0 && decayPerMille <= 1000,
      s"TimeSeries.ewmaPerKey: decay must be in [0, 1000] per-mille, got $decayPerMille")
    val d = decayPerMille; val u = 1000L - decayPerMille
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(
        struct((orderCols.map(col) :+ col(valueCol)): _*))).as("__seq"))
      .withColumn("__vals", expr(s"transform(__seq, r -> r.$valueCol)"))
      .select(col(keyCol),
        size(col("__vals")).cast("long").as("n_points"),
        expr(s"aggregate(slice(__vals, 2, size(__vals) - 1), __vals[0], " +
          s"(acc, x) -> ($d * acc + $u * x) DIV 1000)").as("ewma"))
  }

  /** Exact trailing-window distinct entities per day — "7-day rolling active
    * users" — WITHOUT a distinct-over-window (no engine supports
    * `COUNT(DISTINCT) OVER RANGE`, and the naive per-day self-join re-scans
    * the window's raw events `windowDays` times).
    *
    * The distributed-exact shape: dedupe to (entity, active day) pairs —
    * activity-sized, map-side combined — then CONTRIBUTE each pair forward:
    * an entity active on day d is "recently active" on every window day in
    * [d, d+windowDays); explode that bounded `sequence`, dedupe (entity,
    * window day) so multiple active days inside one window count once, and
    * count per window day. Rows scale linearly (`windowDays ×` the DISTINCT
    * activity pairs, not the raw events); every stage is a hash aggregate.
    * Window days with no events at all are dropped (semi-join against the
    * real active-day set), so the answer matches the per-day question "how
    * many distinct entities in the last `windowDays` days".
    *
    * Output: `(window_day, active_7d)` per active day. The sketch-path
    * sibling at 100 TB: daily HLL sketch tables (q109) merged over the
    * trailing window — constant state per day, ~2% error; this is the EXACT
    * path. */
  def rollingDistinct(df: DataFrame, entityCol: String, tsCol: String,
                      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1,
      s"TimeSeries.rollingDistinct: windowDays must be >= 1, got $windowDays")
    val active = df
      .filter(col(entityCol).isNotNull)
      .select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__d"))
      .distinct()
    val days = active.select(col("__d")).distinct()
    active
      .select(col("__e"), explode(expr(
        s"sequence(__d, date_add(__d, ${windowDays - 1}), interval 1 day)"))
        .as("__wd"))
      .distinct()
      .join(days.withColumnRenamed("__d", "__wd"), Seq("__wd"), "left_semi")
      .groupBy(col("__wd").as("window_day"))
      .agg(count(lit(1)).as(s"active_${windowDays}d"))
  }

  /** Peak concurrency per key — the sweep-line answer to "how many intervals
    * were open at once, at the worst moment?" (max concurrent sessions,
    * simultaneous jobs, overlapping reservations).
    *
    * Each interval `[start, end)` (µs, end EXCLUSIVE) contributes a `+1` at
    * its start and a `-1` at its end; the running sum of deltas in
    * `(t, delta)` order is the number of open intervals, and its per-key max
    * is the peak. Ordering `delta` ascending at equal `t` processes ends
    * before starts, so an interval ending exactly when another begins never
    * counts as overlap — the half-open convention. Rows tied on BOTH
    * `(t, delta)` sort arbitrarily, but the running-sum max is invariant to
    * their order (they all move the sum the same direction), so the result
    * is deterministic anyway.
    *
    * Scale: 2 rows per interval, one key-partitioned window sort — shuffles
    * on the key only, never a global sort. Per-key data = 2× its interval
    * count; a key with billions of intervals would pre-aggregate deltas per
    * (key, t) first (the sum over a window of per-t net deltas has the same
    * max at event boundaries). */
  def peakConcurrency(df: DataFrame, keyCol: String,
                      startMicros: Column, endMicros: Column): DataFrame = {
    val deltas = df.select(col(keyCol), startMicros.as("__t"), lit(1L).as("__delta"))
      .unionAll(df.select(col(keyCol), endMicros.as("__t"), lit(-1L).as("__delta")))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__open", sum(col("__delta")).over(w))
      .groupBy(col(keyCol))
      .agg(max(col("__open")).as("peak_open"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
  }

  /** Spike detection on a keyed daily count series: a day is a spike when its
    * count exceeds `factorPct`% of the TRAILING `windowDays`-day median
    * (current day excluded). The trailing median — not the mean — so one
    * prior spike doesn't inflate the threshold and mask the next one.
    *
    * The series is densified to every day in each key's observed span
    * (missing days count 0) BEFORE the window, so "7 trailing rows" always
    * means 7 trailing DAYS; only days with the full trailing window emit.
    * `windowDays` must be odd: the median of an odd count of integers is an
    * integer element, exactly representable and identical on every engine —
    * an even-count interpolated median is a float coin-flip. Comparison is
    * integer cross-multiplication (`n·100 > factorPct·median`), never a
    * division.
    *
    * Output: `(key, day, n, trailing_median, is_spike)` for full-window days.
    *
    * Scale: counts-per-day are a map-side-combinable aggregate (activity →
    * one row per key×day); densify + window shuffle on the key only; per-key
    * state is the day span, not the event count. */
  def spikesVsTrailingMedian(events: DataFrame, keyCol: String, tsCol: String,
                             windowDays: Int = 7, factorPct: Long = 200L): DataFrame = {
    require(windowDays >= 1 && windowDays % 2 == 1,
      s"TimeSeries.spikesVsTrailingMedian: windowDays must be odd >= 1, got $windowDays")
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("n"))
    val span = daily.groupBy(col(keyCol))
      .agg(min(col("__day")).as("__d0"), max(col("__day")).as("__d1"))
    val dense = span.select(col(keyCol),
      explode(expr("sequence(__d0, __d1, interval 1 day)")).as("__day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(-windowDays, -1)
    dense.join(daily, Seq(keyCol, "__day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("__full", count(lit(1)).over(w) === windowDays)
      .withColumn("trailing_median",
        round(expr(s"percentile(n, 0.5) OVER (PARTITION BY $keyCol ORDER BY __day " +
          s"ROWS BETWEEN $windowDays PRECEDING AND 1 PRECEDING)")).cast("long"))
      .filter(col("__full"))
      .withColumn("is_spike", col("n") * 100L > lit(factorPct) * col("trailing_median"))
      .select(col(keyCol), col("__day").as("day"), col("n"),
        col("trailing_median"), col("is_spike"))
  }

  /** Consecutive-day activity streaks per key — the gaps-and-islands
    * pattern: an entity active on days {d, d+1, …} forms one "island", and
    * `dayNumber − row_number` is constant exactly within an island (both
    * advance by 1 per consecutive day), so islands fall out of one keyed
    * window + one groupBy with NO self-join and NO iteration. The
    * engagement-analysis staple (login streaks, sensor uptime runs).
    *
    * Output per key: `(n_active_days, n_streaks, longest_streak)`.
    *
    * Scale: distinct (key, day) first — activity-sized, map-side combined —
    * then a key-partitioned window (per-key state = its active-day count)
    * and two strict key-coarsening aggregates. */
  def activityStreaks(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val active = df.select(col(keyCol), to_date(col(tsCol)).as("__d")).distinct()
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d"))
    active
      .withColumn("__island",
        datediff(col("__d"), lit("1970-01-01").cast("date")) - row_number().over(w))
      .groupBy(col(keyCol), col("__island"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(keyCol))
      .agg(sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"))
  }

  /** Holt double exponential smoothing per key — level + trend, the
    * forecast-friendly sibling of [[ewmaPerKey]] (which flattens trends):
    *   l₀ = x₀, b₀ = x₁ − x₀,
    *   lₜ = (α·xₜ + (1000−α)·(l+b)) DIV 1000,
    *   bₜ = (β·(lₜ−l) + (1000−β)·b)  DIV 1000,
    * with per-mille integer weights and integer division, so the fixpoint is
    * bit-identical on any engine and any partitioning. Output per key:
    * `(n_points, level, trend, forecast_1 = level+trend)`; keys with <2
    * points are dropped (the trend seed needs two observations).
    *
    * Scale: one shuffle; same bounded-per-key-array contract as
    * [[ewmaPerKey]] — bucket the key first if a key's history is unbounded. */
  def holtLinearPerKey(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       valueCol: String, alphaPerMille: Long = 300L,
                       betaPerMille: Long = 100L): DataFrame = {
    require(alphaPerMille >= 0 && alphaPerMille <= 1000 &&
      betaPerMille >= 0 && betaPerMille <= 1000,
      "TimeSeries.holtLinearPerKey: weights must be in [0, 1000] per-mille")
    val a = alphaPerMille; val ua = 1000L - a
    val b = betaPerMille; val ub = 1000L - b
    val lNew = s"(($a * x + $ua * (acc.l + acc.b)) DIV 1000)"
    df.groupBy(col(keyCol))
      .agg(array_sort(collect_list(
        struct((orderCols.map(col) :+ col(valueCol)): _*))).as("__seq"))
      .withColumn("__vals", expr(s"transform(__seq, r -> r.$valueCol)"))
      .filter(size(col("__vals")) >= 2)
      // NB mixed index bases in Spark SQL: `arr[i]` subscripts are 0-BASED,
      // `slice(arr, start, len)` is 1-based — so the seeds are __vals[0]/[1]
      // while the fold starts at slice position 3 (the third observation).
      .withColumn("__st", expr(
        s"aggregate(slice(__vals, 3, size(__vals) - 2), " +
          s"named_struct('l', __vals[0], 'b', __vals[1] - __vals[0]), " +
          s"(acc, x) -> named_struct('l', $lNew, " +
          s"'b', (($b * ($lNew - acc.l) + $ub * acc.b) DIV 1000)))"))
      .select(col(keyCol), size(col("__vals")).cast("long").as("n_points"),
        col("__st.l").as("level"), col("__st.b").as("trend"),
        (col("__st.l") + col("__st.b")).as("forecast_1"))
  }

  /** CUSUM changepoint per key over the DENSIFIED daily count series: the
    * day where the cumulative deviation from the key's overall mean peaks —
    * the standard "when did the level shift" detector. Kept integer by
    * scaling: `S'ₜ = n·prefixₜ − t·total` equals `n·Σᵢ≤ₜ(xᵢ − mean)` without
    * ever dividing; the argmax of `|S'|` (ties → earliest day) is the
    * changepoint, and `cusum_peak = |S'|` its strength (divide by n·days
    * downstream for a normalized score).
    *
    * Output: `(key, change_day, cusum_peak, n_days)`.
    *
    * Scale: one key-partitioned running-sum window over the day grid + a
    * max-struct argmax aggregate — shuffles on the key only. */
  def cusumChangepoint(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val span = daily.groupBy(col(keyCol))
      .agg(min(col("__day")).as("__d0"), max(col("__day")).as("__d1"))
    val dense = span
      .select(col(keyCol), explode(expr("sequence(__d0, __d1, interval 1 day)")).as("__day"))
      .join(daily, Seq(keyCol, "__day"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = dense.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__days"), sum(col("__n")).as("__total"))
    dense
      .withColumn("__t", count(lit(1)).over(w))
      .withColumn("__prefix", sum(col("__n")).over(w))
      .join(totals, Seq(keyCol))
      .withColumn("__s", abs(col("__days") * col("__prefix") - col("__t") * col("__total")))
      .withColumn("__dn", datediff(col("__day"), lit("1970-01-01").cast("date")).cast("long"))
      .groupBy(col(keyCol))
      .agg(max(struct(col("__s"), (-col("__dn")).as("__nd"))).as("__m"),
        max(col("__days")).as("n_days"))
      .select(col(keyCol),
        date_add(lit("1970-01-01").cast("date"), (-col("__m.__nd")).cast("int")).as("change_day"),
        col("__m.__s").as("cusum_peak"), col("n_days"))
  }

  /** Day-of-week seasonal index per key: how much busier is each weekday
    * than the key's average day — `index = mean(count | dow) / mean(count)`,
    * reported as `⌊10⁶·index⌋` by integer cross-multiplication
    * (`sum_dow·n_days_total` vs `sum_total·n_days_dow`), never a float
    * division. The series densifies to every day in the key's span (absent
    * days count 0) so a sparse weekday isn't flattered by only counting its
    * active days. Weekday is computed ARITHMETICALLY — `(epochDay + 4) mod
    * 7`, 0 = Sunday — because engines disagree on dayofweek() numbering
    * (Spark: 1=Sunday; DuckDB dow: 0=Sunday); epoch-day arithmetic is
    * engine-proof.
    *
    * Output: `(key, dow, n_days, n_events, index_micro)`.
    *
    * Scale: daily counts are map-side combined; densify + the two
    * aggregates shuffle on the key only. */
  def seasonalIndexByDow(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).as("__n"))
    val span = daily.groupBy(col(keyCol))
      .agg(min(col("__day")).as("__d0"), max(col("__day")).as("__d1"))
    val dense = span
      .select(col(keyCol), explode(expr("sequence(__d0, __d1, interval 1 day)")).as("__day"))
      .join(daily, Seq(keyCol, "__day"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("dow",
        (datediff(col("__day"), lit("1970-01-01").cast("date")) + 4) % 7)
    val perDow = dense.groupBy(col(keyCol), col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("__n")).as("n_events"))
    val perKey = dense.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__days_all"), sum(col("__n")).as("__events_all"))
    perDow.join(perKey, Seq(keyCol))
      .select(col(keyCol), col("dow"), col("n_days"), col("n_events"),
        when(col("__events_all") > 0 && col("n_days") > 0,
          expr("(1000000L * n_events * __days_all) DIV (__events_all * n_days)"))
          .as("index_micro"))
  }

  /** Interval UNION per key — total covered time merging overlaps — the
    * sweep-line sibling of [[peakConcurrency]]: in `(start, end)` order, an
    * interval starts a NEW merged segment iff its start lies strictly past
    * the running max of previous ends (touching intervals `[a,b) [b,c)`
    * merge); segment id = running count of starts; coverage = Σ(segment max
    * end − segment min start). Answers "how much wall-clock was this user /
    * machine actually busy" where Σdurations double-counts overlap.
    *
    * Output: `(key, n_intervals, n_segments, covered_us)`.
    *
    * Scale: two key-partitioned windows + two strict key-coarsening
    * aggregates — shuffles on the key only. */
  def intervalUnion(df: DataFrame, keyCol: String,
                    startMicros: Column, endMicros: Column): DataFrame = {
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), startMicros.as("__s"), endMicros.as("__e"))
      .withColumn("__pmax", max(col("__e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__s") > col("__pmax"), 1L).otherwise(0L))
      .withColumn("__seg", sum(col("__new")).over(wRun))
      .groupBy(col(keyCol), col("__seg"))
      .agg(min(col("__s")).as("__cs"), max(col("__e")).as("__ce"),
        count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_segments"),
        sum(col("__ce") - col("__cs")).as("covered_us"))
  }

  /** Spread each row's integer amount evenly across `periods` consecutive
    * months with EXACT remainder allocation — slice `i` gets
    * `⌊amt/periods⌋ + (1 if i < amt pmod periods)`, so every row's slices sum
    * back to its amount to the cent (float proration leaks pennies; so does
    * rounding each slice independently). Floor-division + positive-modulus
    * semantics keep the identity exact for NEGATIVE amounts too (credits /
    * refunds): Spark's `DIV`/`%` truncate toward zero, under which the
    * remainder bump would never fire for a negative amount and Σslices would
    * drift (e.g. −5 over 3 months must give −1,−2,−2, not −1,−1,−1). The
    * revenue-recognition / subscription-amortization primitive, aggregated
    * to calendar months.
    *
    * Output: `(month, n_slices, recognized_cents)` — one row per calendar
    * month, Σrecognized_cents over all months = Σamounts exactly.
    *
    * Scale: a `periods`-way explode (bounded fan-out) into a map-side
    * combined aggregate on the month — no join, no window. */
  def prorateOverMonths(df: DataFrame, amountCents: Column, startDate: Column,
                        periods: Int): DataFrame = {
    require(periods >= 1, s"prorateOverMonths: periods must be >= 1, got $periods")
    df.select(trunc(startDate, "MM").as("__m0"), amountCents.as("__amt"))
      .select(col("__m0"), col("__amt"),
        explode(expr(s"sequence(0, ${periods - 1})")).as("__i"))
      .groupBy(add_months(col("__m0"), col("__i")).as("month"))
      .agg(count(lit(1)).as("n_slices"),
        // floor(amt/p) = (amt - pmod(amt,p)) / p exactly, both signs
        sum(expr(s"(__amt - pmod(__amt, $periods)) DIV $periods " +
          s"+ CASE WHEN __i < pmod(__amt, $periods) THEN 1 ELSE 0 END"))
          .as("recognized_cents"))
  }

  /** Linear interpolation onto the daily grid — the sibling of LOCF gap-fill
    * (q135): between each consecutive pair of observations `(d0, y0)`,
    * `(d1, y1)` of a key, every missing day `d0 + i` gets
    * `y0 + ⌊(y1 − y0)·i / gap⌋` (integer cents, truncation toward zero —
    * identical on Spark `DIV` and DuckDB `//`), observed days keep their
    * exact value and `interpolated = false`. The resampling pass that turns
    * an irregular per-key series into a regular one for downstream
    * window/seasonality ops without inventing float drift.
    *
    * Input must have ONE row per (key, day) (pre-aggregate ties). Output:
    * `(key, day, cents, interpolated)`.
    *
    * Scale: one key-partitioned lead window + a per-pair `sequence` explode
    * whose fan-out is the gap length — bounded by the series' maximum hole,
    * never by corpus size. No join. */
  def linearInterpolateDaily(df: DataFrame, keyCol: String, dayCol: Column,
                             valueCents: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__d"))
    df.select(col(keyCol), dayCol.as("__d"), valueCents.as("__y"))
      .withColumn("__dn", lead(col("__d"), 1).over(w))
      .withColumn("__yn", lead(col("__y"), 1).over(w))
      .withColumn("__gap",
        when(col("__dn").isNotNull, datediff(col("__dn"), col("__d"))).otherwise(lit(1)))
      .withColumn("__i", explode(expr("sequence(0, __gap - 1)")))
      .select(col(keyCol),
        date_add(col("__d"), col("__i")).as("day"),
        // __i = 0 is the observed point itself (also the last-row case,
        // where __yn is NULL and the interpolation term would poison it)
        expr("CASE WHEN __i = 0 THEN __y " +
          "ELSE __y + ((__yn - __y) * __i) DIV __gap END").as("cents"),
        (col("__i") > 0).as("interpolated"))
  }

  /** Lag-1 autocorrelation per key — "does this series trend or mean-revert"
    * — as the SIGNED SQUARED Pearson correlation of consecutive pairs
    * `(xₜ, xₜ₊₁)`: `sign(cov)·10⁶·cov²/(varₓ·varᵧ)`, which is rational
    * (Pearson r itself needs a square root) and therefore exact in
    * decimal(38,0) integer arithmetic on any engine. +10⁶ = perfectly
    * persistent, −10⁶ = perfectly alternating, 0 = white.
    *
    * Input must have at most one row per `(key, t)` (pre-aggregate ties —
    * a nondeterministic lead order would change the pair set). NULL when a
    * key has <2 pairs or either variance is zero.
    *
    * Output: `(key, n_pairs, r2_signed_micro)`. Scale: one key-partitioned
    * lead window + one map-side-combined aggregate. */
  def lagAutocorrelation(df: DataFrame, keyCol: String, tsMicros: Column,
                         valueCents: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
    df.select(col(keyCol), tsMicros.as("__t"), valueCents.as("__x"))
      .withColumn("__y", lead(col("__x"), 1).over(w))
      .filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .select(col(keyCol), col("n_pairs"),
        expr("CAST(n_pairs AS DECIMAL(38,0))").as("__n"),
        expr("CAST(__sx AS DECIMAL(38,0))").as("__dsx"),
        expr("CAST(__sy AS DECIMAL(38,0))").as("__dsy"),
        expr("CAST(__sxx AS DECIMAL(38,0))").as("__dsxx"),
        expr("CAST(__syy AS DECIMAL(38,0))").as("__dsyy"),
        expr("CAST(__sxy AS DECIMAL(38,0))").as("__dsxy"))
      .withColumn("__cov", expr("__n * __dsxy - __dsx * __dsy"))
      .withColumn("__vx", expr("__n * __dsxx - __dsx * __dsx"))
      .withColumn("__vy", expr("__n * __dsyy - __dsy * __dsy"))
      .select(col(keyCol), col("n_pairs"),
        when(col("n_pairs") >= 2 && col("__vx") =!= 0 && col("__vy") =!= 0,
          expr("CAST(CASE WHEN __cov < 0 THEN -((1000000 * __cov * __cov) DIV (__vx * __vy)) " +
            "ELSE (1000000 * __cov * __cov) DIV (__vx * __vy) END AS BIGINT)"))
          .as("r2_signed_micro"))
  }

  /** Time-weighted average per key over a step function: each observation
    * holds its value until the NEXT observation, and the TWAP is
    * `Σ valueᵢ·(tᵢ₊₁−tᵢ) / Σ(tᵢ₊₁−tᵢ)` — the metric that answers "what was
    * the average price/level over TIME", where the arithmetic mean
    * over-weights bursts of closely-spaced points. The last observation per
    * key carries no duration and drops out (a step function needs a right
    * endpoint).
    *
    * Integer-exact: values in cents, durations in µs, the final ratio as
    * integer division (`num DIV den`, reported in cents) — identical on any
    * engine. Overflow bound: Σ cents·µs must fit int64 — at 2³¹ cents ·
    * one-year spans, ~10²⁸ would overflow, so callers at that scale bucket
    * time first; at event-log magnitudes (≤10⁵ cents, ≤10¹² µs spans,
    * ≤10⁶ rows/key) the sum stays ≤10²³⁄rows… within int64 for the tested
    * magnitudes, and the `sum` is checked by the oracle bit-for-bit.
    *
    * Output: `(key, n_segments, span_us, twap_cents)`.
    *
    * Scale: one key-partitioned window (`lead`) + one hash aggregate — both
    * shuffle on the key only. */
  def twapPerKey(df: DataFrame, keyCol: String, tsMicros: Column,
                 valueCents: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
    df.select(col(keyCol), tsMicros.as("__t"), valueCents.as("__v"))
      .withColumn("__dt", lead(col("__t"), 1).over(w) - col("__t"))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__dt")).as("span_us"),
        expr("sum(__v * __dt) DIV sum(__dt)").as("twap_cents"))
  }

  /** Rolling-origin forecast backtest (time-series cross-validation,
    * Hyndman & Athanasopoulos, "Forecasting: Principles and Practice" §5.10):
    * at every observation the one-step NAIVE forecast (previous observation)
    * and the SEASONAL-NAIVE forecast (the observation `season` steps back)
    * are scored against the actual, per key. This is the evaluation harness
    * that decides which forecaster (naive / seasonal / EWMA / Holt — q140,
    * q196) a pipeline should trust per series.
    *
    * Reported per key, integer-exact (errors stay in input units, summed —
    * no division, so MAE = sae/n and bias are left to the consumer):
    * `(key, n_naive, sae_naive, bias_naive, n_seasonal, sae_seasonal,
    * bias_seasonal)`.
    *
    * Lags are OBSERVATION-index lags — gap-fill first ([[gapFillForwardFill]])
    * if calendar-step semantics are needed on sparse series.
    *
    * Scale: one key-partitioned window (two lags share it) + one hash
    * aggregate; shuffles on the key only. */
  def rollingOriginBacktest(series: DataFrame, keyCol: String, tCol: String,
                            vCol: String, season: Int): DataFrame = {
    require(season >= 2, s"season must be >= 2 (1 would duplicate naive), got $season")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol))
    series
      .withColumn("__fn", lag(col(vCol), 1).over(w))
      .withColumn("__fs", lag(col(vCol), season).over(w))
      .groupBy(col(keyCol))
      .agg(
        count(col("__fn")).as("n_naive"),
        sum(abs(col(vCol) - col("__fn"))).as("sae_naive"),
        sum(col(vCol) - col("__fn")).as("bias_naive"),
        count(col("__fs")).as("n_seasonal"),
        sum(abs(col(vCol) - col("__fs"))).as("sae_seasonal"),
        sum(col(vCol) - col("__fs")).as("bias_seasonal"))
  }
}
