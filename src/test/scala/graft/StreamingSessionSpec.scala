package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ext.{SessionEvent, Sessionize}

/** Proves the streaming sessionizer (`flatMapGroupsWithState`, event-time
  * timeout) emits exactly the sessions the batch two-window form derives, on
  * seeded out-of-order event data fed across several micro-batches. Sessions
  * that span micro-batch boundaries must be stitched by state; the trailing
  * open session per user must close via watermark timeout, not data.
  */
class StreamingSessionSpec extends SparkSpec {

  private def tsOf(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  test("streaming sessions == batch window sessions (cross-batch stitch + timeout close)") {
    val s = spark
    import s.implicits._

    val gapSeconds = 30L
    val rnd = new scala.util.Random(42)
    val baseUs = 1700000000L * 1000000L

    // 8 users x 40 events; ~20% of steps jump past the gap => multiple
    // sessions per user. Microsecond offsets keep per-user timestamps unique
    // (deterministic lag order in the batch form).
    val events: Seq[SessionEvent] = (0 until 8).flatMap { u =>
      var t = baseUs + rnd.nextInt(1000000)
      (0 until 40).map { _ =>
        t += (if (rnd.nextDouble() < 0.2) (gapSeconds + 1 + rnd.nextInt(120)) * 1000000L
              else 1000000L + rnd.nextInt(5000000))
        SessionEvent(s"user_$u", tsOf(t))
      }
    }

    // Batch truth: the two-window form over the same rows.
    val expected = Sessionize
      .sessionSummaries(events.toDF(), col("user_id"), unix_micros(col("ts")),
        gapSeconds, Seq(col("ts")))
      .select("user_id", "session_start_us", "session_end_us", "n_events", "duration_s")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    // Stream the same rows in three time-ordered micro-batches, shuffled
    // WITHIN each batch (the 10s watermark covers intra-batch disorder; batch
    // boundaries are in time order so nothing is late-dropped).
    val sortedAll = events.sortBy(e => e.ts.toInstant.toEpochMilli -> e.ts.getNanos)
    val chunks = sortedAll.grouped((sortedAll.size + 2) / 3).toSeq
    val maxUs = unixMicros(sortedAll.last.ts)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = Sessionize.streamSessionSummaries(
      input.toDS().withWatermark("ts", "10 seconds"), gapSeconds)
    val query = sessions.writeStream
      .format("memory").queryName("stream_sessions").outputMode("append").start()
    try {
      chunks.foreach { c => input.addData(rnd.shuffle(c)); query.processAllAvailable() }
      // Advance the watermark far past every open session's end+gap so the
      // trailing sessions close by TIMEOUT. Two probes: the first moves the
      // watermark, the second guarantees a batch runs after it moved.
      input.addData(SessionEvent("__probe", tsOf(maxUs + 3600L * 1000000L)))
      query.processAllAvailable()
      input.addData(SessionEvent("__probe", tsOf(maxUs + 7200L * 1000000L)))
      query.processAllAvailable()
    } finally query.stop()

    val got = spark.table("stream_sessions")
      .filter(col("user_id") =!= "__probe")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet

    assert(got == expected,
      s"stream-only: ${(got -- expected).take(3)}; batch-only: ${(expected -- got).take(3)}")
    assert(expected.size > 8, "seeded data must produce multiple sessions per user")
  }

  private def unixMicros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("two-window sessionizer matches Spark's native session_window aggregation") {
    val s = spark
    import s.implicits._
    val gapSeconds = 30L
    val rnd = new scala.util.Random(11)
    val baseUs = 1700000000L * 1000000L
    // Gaps of exactly `gap` are avoided here to isolate the common case.
    // (The boundary itself is pinned by Round9cSpec: session_window's
    // extension is INCLUSIVE — an exactly-gap successor MERGES, same as the
    // lag form's `diff > gap` starts-new convention.)
    val events = (0 until 6).flatMap { u =>
      var t = baseUs + rnd.nextInt(1000000)
      (0 until 30).map { _ =>
        t += (if (rnd.nextDouble() < 0.25) (gapSeconds * 2 + rnd.nextInt(60)) * 1000000L
              else 1000000L + rnd.nextInt(3000000))
        (s"user_$u", tsOf(t))
      }
    }.toDF("user_id", "ts")

    val ours = Sessionize
      .sessionSummaries(events, col("user_id"), unix_micros(col("ts")),
        gapSeconds, Seq(col("ts")))
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"))

    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"))
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"))

    assert(ours.exceptAll(native).isEmpty && native.exceptAll(ours).isEmpty,
      "two-window sessionization must agree with native session_window")
  }
}
