package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the streaming sessionization input (typed for the state fn). */
case class SessionEvent(user_id: String, ts: java.sql.Timestamp)

/** The per-user open session carried in [[GroupState]] between micro-batches. */
case class OpenSession(startUs: Long, endUs: Long, n: Long)

/** One closed session — same shape as [[Sessionize.sessionSummaries]] output. */
case class ClosedSession(user_id: String, session_start_us: Long,
                         session_end_us: Long, n_events: Long, duration_s: Long)

/** Gap-based sessionization — the standard clickstream/session primitive the
  * reference's event pipeline stops short of (its gold activity tables count
  * pre-assigned session ids; nothing *derives* sessions from event times).
  *
  * Construction is the classic two-window pass, all codegen:
  *   1. `lag(ts)` per user (one shuffle on the user key, sorted by time);
  *   2. boundary flag where `ts − lag(ts) > gap` (or first event);
  *   3. running `sum(flag)` over the same window ⇒ session index.
  *
  * Scale: one shuffle + per-key sort, state O(1) per row — the same plan shape
  * Spark uses for any ranked window. Skewed power users are bounded by the
  * per-user event count, not corpus size. The streaming analog (true unbounded
  * sessions with timeouts) is [[Sessionize.streamSessionSummaries]]
  * (`flatMapGroupsWithState`, event-time timeout) — equivalence with this
  * batch form is asserted by StreamingSessionSpec. For bounded/batch data the
  * window form is the Spark-first answer: no JVM state functions, fully
  * whole-stage codegen.
  */
object Sessionize {

  /** Ordered conversion funnel: for a stage sequence (e.g. click → view →
    * purchase), count the users who reached each stage IN ORDER — a user
    * counts for stage i only if their earliest qualifying stage-i event is
    * strictly after their earliest qualifying stage-(i−1) event. This is the
    * sequential-min formulation every product-analytics engine uses; an
    * unordered "did all three ever happen" count overstates conversion.
    *
    * Output: one row per stage — `(stage_idx, stage, n_users)` — with a row
    * even for stages no user reached (n_users = 0), so the funnel shape is
    * always complete.
    *
    * Scale: stage i is a semi-filtered scan joined to the stage-(i−1)
    * reached-set on the user key and min-aggregated — every shuffle in the
    * chain is on the SAME key, so a 1000-executor run re-partitions once and
    * the subsequent stages reuse the exchange; reached-sets only shrink.
    * The final per-stage counts are 1-row aggregates unioned lazily (no
    * driver-side loop of actions). */
  def funnelCounts(events: DataFrame, user: Column, tsMicros: Column,
                   stageCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelCounts: need at least one stage")
    require(stages.distinct.size == stages.size, "funnelCounts: stages must be distinct")
    val base = events.select(user.as("__u"), stageCol.as("__stage"), tsMicros.as("__us"))
    val reachedPerStage = stages.zipWithIndex.map { case (st, i) =>
      (st, i)
    }.scanLeft(Option.empty[(String, Int, DataFrame)]) {
      case (prev, (st, i)) =>
        val mine = base.filter(col("__stage") === st)
        val reached = prev match {
          case None =>
            mine.groupBy(col("__u")).agg(min(col("__us")).as("__t"))
          case Some((_, _, prevReached)) =>
            mine.join(prevReached.select(col("__u"), col("__t").as("__tprev")), Seq("__u"))
              .filter(col("__us") > col("__tprev"))
              .groupBy(col("__u")).agg(min(col("__us")).as("__t"))
        }
        Some((st, i, reached))
    }.flatten
    reachedPerStage.map { case (st, i, reached) =>
      reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-user conversion LAG between two funnel stages: for users who reach
    * `toStage` in order (first qualifying event strictly after their first
    * `fromStage` event — [[funnelCounts]] semantics), the elapsed µs between
    * the two firsts. The input to time-to-convert distributions; users who
    * never convert simply don't appear (measure conversion RATE with
    * [[funnelCounts]], time only over converters).
    *
    * Scale: same shape as one funnel stage — a filtered scan joined to the
    * from-stage firsts on the user key, min-aggregated; all shuffles on
    * `user_id`. Output: (user_id, lag_us). */
  def conversionLags(events: DataFrame, user: Column, tsMicros: Column,
                     stageCol: Column, fromStage: String, toStage: String): DataFrame = {
    val base = events.select(user.as("user_id"), stageCol.as("__stage"), tsMicros.as("__us"))
    val from = base.filter(col("__stage") === fromStage)
      .groupBy(col("user_id")).agg(min(col("__us")).as("__t_from"))
    base.filter(col("__stage") === toStage)
      .join(from, Seq("user_id"))
      .filter(col("__us") > col("__t_from"))
      .groupBy(col("user_id"))
      // __t_from is constant per user; min() just carries it through the agg
      .agg((min(col("__us")) - min(col("__t_from"))).as("lag_us"))
  }

  /** Last-touch attribution: each conversion event is credited to the most
    * recent PRECEDING touch event of the user (channel = the touch's stage
    * value), or `defaultChannel` when no touch precedes it — the standard
    * marketing-attribution rule. Output: one row per conversion event,
    * `(user_id, conv_id, channel)`.
    *
    * Scale: one key-partitioned window (`last(..., ignoreNulls)` over rows
    * strictly before the current one) — a single shuffle on the user key, no
    * self-join; first-touch is the same window with `first`. `orderCols`
    * must extend the timestamp to a total order. */
  def lastTouchAttribution(events: DataFrame, user: Column, stageCol: Column,
                           idCol: Column, orderCols: Seq[Column],
                           touchStages: Seq[String], convStage: String,
                           defaultChannel: String = "direct"): DataFrame = {
    require(touchStages.nonEmpty, "lastTouchAttribution: need touch stages")
    require(!touchStages.contains(convStage),
      "lastTouchAttribution: conversion stage cannot also be a touch stage")
    val w = Window.partitionBy(col("__u")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(Seq(user.as("__u"), stageCol.as("__stage"),
        idCol.as("__id")) ++ orderCols: _*)
      .withColumn("__touch",
        last(when(col("__stage").isin(touchStages.map(lit): _*), col("__stage")),
          ignoreNulls = true).over(w))
      .filter(col("__stage") === convStage)
      .select(col("__u").as("user_id"), col("__id").as("conv_id"),
        coalesce(col("__touch"), lit(defaultChannel)).as("channel"))
  }

  /** First-order transition counts between consecutive event types per user —
    * the empirical Markov matrix behind "what do users do after X" analyses
    * and sequence-model sanity checks. Output:
    * `(from_type, to_type, n_transitions)`.
    *
    * Scale: one key-partitioned `lead` window (single shuffle on the user
    * key) + a map-side-combined count over ≤ |types|² groups. `orderCols`
    * must extend the timestamp to a total order. */
  def transitionCounts(events: DataFrame, user: Column, stageCol: Column,
                       orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__u")).orderBy(orderCols: _*)
    events.select(Seq(user.as("__u"), stageCol.as("__stage")) ++ orderCols: _*)
      .withColumn("__next", lead(col("__stage"), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col("__stage").as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Top-`k` most common length-`len` event-type PATHS (consecutive stage
    * runs per user in time order) — [[transitionCounts]] generalized from
    * bigrams to arbitrary path length: `len − 1` stacked `lead`s inside ONE
    * per-user window pass (one shuffle on the user key, window state bounded
    * per user), then a map-combined path count and a TakeOrdered top-k
    * (`count DESC`, then the stage names — total order, deterministic).
    * The product-analytics "what do users actually do in 3 steps" query.
    * Output: `(step_1 … step_len, n_paths)`. */
  def topPaths(events: DataFrame, user: Column, stageCol: Column,
               orderCols: Seq[Column], len: Int, k: Int): DataFrame = {
    require(len >= 2, s"topPaths: path length must be >= 2, got $len")
    val w = Window.partitionBy(col("__u")).orderBy(orderCols: _*)
    val base = events.select(
      Seq(user.as("__u"), stageCol.as("step_1")) ++ orderCols: _*)
    val withSteps = (2 to len).foldLeft(base) { (df, i) =>
      df.withColumn(s"step_$i", lead(col("step_1"), i - 1).over(w))
    }.filter((2 to len).map(i => col(s"step_$i").isNotNull).reduce(_ && _))
    val stepCols = (1 to len).map(i => col(s"step_$i"))
    withSteps.groupBy(stepCols: _*)
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(desc("n_paths") +: stepCols.map(_.asc): _*)
      .limit(k)
  }

  /** Assign `session_idx` (0-based, per user, in time order) to every event.
    * `orderCols` must extend `ts` to a total order (deterministic lag). */
  def assignSessions(events: DataFrame, user: Column, tsMicros: Column,
                     gapSeconds: Long, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(user).orderBy(orderCols: _*)
    val gapMicros = gapSeconds * 1000000L
    events
      .withColumn("__ts_us", tsMicros)
      .withColumn("__prev_us", lag(col("__ts_us"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_us").isNull || col("__ts_us") - col("__prev_us") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .drop("__prev_us", "__new_session")
  }

  /** Sessions rolled up to one row each: bounds, event count, duration. */
  def sessionSummaries(events: DataFrame, user: Column, tsMicros: Column,
                       gapSeconds: Long, orderCols: Seq[Column]): DataFrame =
    assignSessions(events, user, tsMicros, gapSeconds, orderCols)
      .groupBy(user.as("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ts_us")).as("session_start_us"),
        max(col("__ts_us")).as("session_end_us"))
      .withColumn("duration_s",
        // floor-of-double, not `/`+cast: Spark's long/long is a double divide and
        // its double→long cast truncates while other engines round — floor() is
        // the one formulation every engine computes identically on these inputs.
        floor((col("session_end_us") - col("session_start_us")) / 1000000L).cast("long"))

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Streaming sessionization over an unbounded event stream: one
    * [[OpenSession]] of state per active user, closed (emitted) either when a
    * later event arrives past the gap or when the event-time watermark passes
    * `session_end + gap` (state timeout). This is the true-streaming analog of
    * [[sessionSummaries]] — same output schema, same session boundaries.
    *
    * The caller owns the watermark (`events.withWatermark("ts", …)`): the
    * watermark delay bounds how out-of-order events may be, and the timeout is
    * set to `session_end + gap`, so a session closes as soon as the watermark
    * proves no in-gap event can still arrive. State per user is O(1) — three
    * longs — so total state is bounded by the active-user cardinality, not the
    * event volume; this is what makes it safe on an unbounded 100 TB/day feed
    * where the batch window form (which needs the full history per user in one
    * sort) is not.
    *
    * Events inside one micro-batch may arrive unsorted; the state function
    * sorts the batch's timestamps for the group before folding them in. Late
    * events older than the watermark are dropped by Spark before reaching the
    * function — the standard streaming contract.
    */
  def streamSessionSummaries(events: Dataset[SessionEvent],
                             gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def close(user: String, s: OpenSession): ClosedSession =
      ClosedSession(user, s.startUs, s.endUs, s.n, (s.endUs - s.startUs) / 1000000L)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // Watermark passed session_end + gap: no in-gap event can arrive.
            val done = close(user, state.get)
            state.remove()
            Iterator.single(done)
          } else {
            val closed = List.newBuilder[ClosedSession]
            var cur = state.getOption
            batch.map(e => micros(e.ts)).toArray.sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.endUs <= gapUs =>
                  cur = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1))
                case Some(s) =>
                  closed += close(user, s)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // GroupState timeouts are millisecond-granular; round UP so the
              // timeout never fires before the full microsecond gap elapses.
              state.setTimeoutTimestamp((s.endUs + gapUs + 999L) / 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** BATCH-incremental sessionization: fold a new batch's session summaries
    * into the accumulated session state, merging across the batch boundary —
    * the daily-incremental complement of the STREAMING path
    * ([[streamSessionSummaries]]): a nightly pipeline re-sessionizing all
    * history is O(history); this is O(state + batch), and q254 proves the
    * fold ≡ one-shot sessionization over everything.
    *
    * CONTRACT: batches are time-partitioned per user — every event in batch
    * N+1 is ≥ every batch-N event of the same user (the standard
    * date-partitioned incremental load). Then at most ONE merge can happen
    * per user per fold: the state's LAST session bridges the batch's FIRST
    * session iff `first.start − last.end ≤ gap` (state sessions are already
    * gap-separated, and later batch sessions start > gap after the batch's
    * first session ends).
    *
    * Inputs and output carry `(user_id, session_start_us, session_end_us,
    * n_events)`. Shape: two per-user min/max-struct aggregates + one equi
    * join on user + anti-join removals — everything shuffles on the user
    * key only. */
  def mergeSessionState(state: DataFrame, batch: DataFrame,
                        gapSeconds: Long): DataFrame = {
    val g = gapSeconds * 1000000L
    val cols = Seq("user_id", "session_start_us", "session_end_us", "n_events")
    // one row per user: the state's last / the batch's first session
    val lastS = state.groupBy(col("user_id")).agg(
      max(struct(col("session_end_us"), col("session_start_us"),
        col("n_events"))).as("ls"))
      .select(col("user_id"), col("ls.session_start_us").as("ls_start"),
        col("ls.session_end_us").as("ls_end"), col("ls.n_events").as("ls_n"))
    val firstB = batch.groupBy(col("user_id")).agg(
      min(struct(col("session_start_us"), col("session_end_us"),
        col("n_events"))).as("fb"))
      .select(col("user_id"), col("fb.session_start_us").as("fb_start"),
        col("fb.session_end_us").as("fb_end"), col("fb.n_events").as("fb_n"))
    val bridged = lastS.join(firstB, Seq("user_id"))
      .where(col("fb_start") - col("ls_end") <= g)
    val merged = bridged.select(col("user_id"),
      col("ls_start").as("session_start_us"),
      col("fb_end").as("session_end_us"),
      (col("ls_n") + col("fb_n")).as("n_events"))
    // remove exactly the two halves that merged, keep everything else
    val stateKept = state.join(
      bridged.select(col("user_id"), col("ls_end").as("session_end_us")),
      Seq("user_id", "session_end_us"), "left_anti")
    val batchKept = batch.join(
      bridged.select(col("user_id"), col("fb_start").as("session_start_us")),
      Seq("user_id", "session_start_us"), "left_anti")
    stateKept.select(cols.map(col): _*)
      .unionByName(batchKept.select(cols.map(col): _*))
      .unionByName(merged.select(cols.map(col): _*))
  }

  /** Linear (equal-credit) multi-touch attribution with EXACT integer
    * conservation — the complement of [[lastTouchAttribution]]: each
    * converting user's 1000 permille of credit splits equally across the
    * distinct channels they touched before converting, using the
    * largest-remainder rule so the split is integral and Σcredit = 1000
    * per user EXACTLY (floats would leak permille across millions of
    * users): with n channels, each gets `1000 DIV n`, and the first
    * `1000 mod n` channels in (first-touch time, channel) order get one
    * extra. Deterministic, engine-replayable.
    *
    * Output per channel: `(channel, n_users, credit_permille)` —
    * Σcredit_permille = 1000 · #converting-users-with-a-prior-touch.
    *
    * Scale: one conversion aggregate, one equi join, one per-user
    * (channel-alphabet-sized) window, one final groupBy — all keyed. */
  def linearAttribution(events: DataFrame, user: Column, tsMicros: Column,
                        channel: Column, isConversion: Column): DataFrame = {
    val conv = events.where(isConversion)
      .groupBy(user.as("u")).agg(min(tsMicros).as("conv_ts"))
    val touches = events
      .select(user.as("u"), tsMicros.as("ts"), channel.as("channel"))
      .join(conv, Seq("u"))
      .where(col("ts") < col("conv_ts"))
      .groupBy(col("u"), col("channel")).agg(min(col("ts")).as("first_ts"))
    val wOrd = Window.partitionBy(col("u"))
      .orderBy(col("first_ts"), col("channel"))
    val wAll = Window.partitionBy(col("u"))
    touches
      .withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("credit",
        expr("1000 DIV n") + when(col("idx") <= expr("1000 % n"), 1L).otherwise(0L))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_users"), sum(col("credit")).as("credit_permille"))
  }
}
