package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * sessions with timeouts) lives in `flatMapGroupsWithState` — see
  * StreamingSessionSpec — but for bounded/batch data this window form is the
  * Spark-first answer: no JVM state functions, fully whole-stage codegen.
  */
object Sessionize {

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
}
