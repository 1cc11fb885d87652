package graft.engine

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, ValueState}

/** Spark 4 `transformWithState` arbitrary-state operators — the successor
  * API to `flatMapGroupsWithState` (which drives the streaming sessionizer,
  * ext/Sessionize.scala:242): typed per-key state handles with explicit
  * lifetimes, timers, and TTL, on the RocksDB state store.
  *
  * [[RunningTotalsProcessor]] is the canonical shape: a per-key running
  * (count, sum) that each micro-batch updates and re-emits — the streaming
  * ledger a metering/billing pipeline keeps per account. State is one fixed-
  * width row per key (bounded by live-key cardinality, not stream length);
  * emission is one row per (key, batch) touched. At 100 TB/day the state
  * store shards by key exactly like any keyed aggregation, and TTL
  * (`TTLConfig`) bounds abandoned keys — configured NONE here because the
  * spec's keys are finite and the assert is exactness.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` — set in the spec;
  * transformWithState does not run on the default HDFS-backed provider).
  */
object StatefulOps {

  case class KeyedValue(key: String, value: Long)
  case class RunningTotal(key: String, n: Long, total: Long)
  case class Tot(n: Long, total: Long)

  class RunningTotalsProcessor extends StatefulProcessor[String, KeyedValue, RunningTotal] {
    @transient private var st: ValueState[Tot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Tot]("totals", Encoders.product[Tot], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[KeyedValue],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunningTotal] = {
      val prev = if (st.exists()) st.get() else Tot(0L, 0L)
      var n = prev.n
      var total = prev.total
      rows.foreach { r => n += 1; total += r.value }
      st.update(Tot(n, total))
      Iterator.single(RunningTotal(key, n, total))
    }
  }

  /** Keyed running totals over a stream of [[KeyedValue]] rows: each
    * micro-batch emits the UPDATED (key, n, total) for every key it
    * touched. Update output mode — downstream sees the latest ledger row
    * per key. */
  def runningTotals(stream: Dataset[KeyedValue]): Dataset[RunningTotal] = {
    import stream.sparkSession.implicits._
    stream.groupByKey(_.key)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
