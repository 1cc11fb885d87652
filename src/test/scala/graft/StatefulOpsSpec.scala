package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.engine.StatefulOps
import graft.engine.StatefulOps.KeyedValue

/** Spark 4 `transformWithState` ledger: per-key running totals on the
  * RocksDB state store, proven across multiple AvailableNow drains —
  * state survives between drains via the checkpoint, and the final ledger
  * row per key equals the batch aggregate over everything ingested. */
class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotals keeps exact per-key state across micro-batches AND restarts") {
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try withTempDir { dir =>
      val in = s"$dir/in"; val ckpt = s"$dir/ckpt"
      // foreachBatch parquet sink: the memory sink refuses checkpoint
      // recovery, and cross-drain state carry-over is exactly what this
      // spec proves.
      def drain(outDir: String): Unit = {
        val stream = spark.readStream
          .schema("key STRING, value BIGINT")
          .option("maxFilesPerTrigger", 1) // multiple micro-batches per drain
          .parquet(in)
          .as[KeyedValue]
        val q = StatefulOps.runningTotals(stream)
          .writeStream.outputMode("update")
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[StatefulOps.RunningTotal], id: Long) =>
            batch.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir): Unit
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def lastPerKey(outDir: String): Map[String, (Long, Long)] =
        spark.read.parquet(outDir)
          .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
            r.getAs[Long]("total"))).toSeq
          .groupBy(_._1).map { case (k, rows) =>
            k -> { val m = rows.maxBy(_._2); (m._2, m._3) } }
      // tick 1: two files -> two micro-batches
      Seq(("a", 1L), ("b", 10L), ("a", 2L)).toDF("key", "value")
        .coalesce(1).write.mode("append").parquet(in)
      Seq(("a", 4L), ("c", 100L)).toDF("key", "value")
        .coalesce(1).write.mode("append").parquet(in)
      drain(s"$dir/out1")
      val last1 = lastPerKey(s"$dir/out1")
      assert(last1("a") === ((3L, 7L)))
      assert(last1("b") === ((1L, 10L)) && last1("c") === ((1L, 100L)))

      // tick 2: NEW drain from the same checkpoint — state must carry over
      Seq(("a", 5L), ("b", -3L)).toDF("key", "value")
        .coalesce(1).write.mode("append").parquet(in)
      drain(s"$dir/out2")
      val last2 = lastPerKey(s"$dir/out2")
      assert(last2("a") === ((4L, 12L)), "state for key a must survive the restart")
      assert(last2("b") === ((2L, 7L)))
      assert(!last2.contains("c"), "untouched keys emit nothing in update mode")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
