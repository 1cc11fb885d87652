package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Regression guard for the events `ts` physical-encoding drift that broke
  * round 8: the driver's testdata generator switched `events.ts` from
  * TIMESTAMP(NANOS) (readable only as long via `nanosAsLong`) to
  * TIMESTAMP(MICROS) (arrives as TIMESTAMP_NTZ), and the loaders hard-assumed
  * the nanos encoding — 30 of 148 queries crashed at analysis.
  *
  * Two checked-in fixtures (src/test/resources/events_ts_encodings/) hold the
  * SAME 20 logical events in both encodings; the nanos file carries a sub-µs
  * residue on every row so the `ts DIV 1000` truncation path is genuinely
  * exercised (not just a unit relabel). Both [[SparkEntry.eventsTable]] and
  * [[SparkEntry.eventsStream]] must load both files and agree on `unix_micros`
  * — the granularity every events oracle compares at (SURVEY.md §7.4).
  */
class TsEncodingSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/events_ts_encodings/$name")
    assert(url != null, s"missing test fixture events_ts_encodings/$name")
    new java.io.File(url.toURI).getAbsolutePath
  }

  /** Expected µs instants — mirrors the generator in the fixture's provenance
    * note: base 2024-03-01T12:00:00Z, 7-minute stride, +123456+i µs offset.
    * The nanos file adds a (789+i)%1000 ns residue that truncation drops. */
  private val expectedUs: Seq[Long] = {
    val baseUs = 1709294400000000L
    (0 until 20).map(i => baseUs + 7L * 60 * 1000000 * i + 123456L + i)
  }

  private def micros(df: DataFrame): Seq[Long] = {
    assert(df.schema("ts").dataType == TimestampType,
      s"ts must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id")).collect().map(_.getLong(1)).toSeq
  }

  for (enc <- Seq("nanos", "micros")) {
    test(s"eventsTable reads the $enc encoding and lands on the same µs instants") {
      assert(micros(SparkEntry.eventsTable(spark, fixture(enc))) == expectedUs)
    }

    test(s"eventsStream reads the $enc encoding and agrees with eventsTable") {
      val sink = s"ts_encoding_stream_$enc"
      spark.catalog.dropTempView(sink)
      val q = SparkEntry.eventsStream(spark, fixture(enc))
        .writeStream.outputMode("append").format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(micros(spark.table(sink)) == expectedUs)
    }
  }

  test("eventsTable rejects an unrecognized ts type loudly") {
    val e = intercept[IllegalStateException] {
      SparkEntry.eventsTsColumn(org.apache.spark.sql.types.StringType)
    }
    assert(e.getMessage.contains("unsupported"))
  }
}
