package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.HeavyHitters

/** Round-14 specs, part 5: streaming Misra–Gries — per-shard state stays
  * capacity-bounded across ticks, the last tick's candidates are a
  * superset of every truly heavy key, and the exact recount over the
  * streamed candidates equals the one-shot batch heavy hitters. */
class Round14eSpec extends SparkSpec {
  import spark.implicits._

  /** Three deltas with one dominant key 'h' (49/105 ≈ 47%, including the
    * 4 occurrences the a..j tail contributes) and a long tail of light
    * keys (≤ 4/105 each); capacity 4 → threshold 1/5. */
  private def deltas: Seq[Seq[String]] = Seq(
    Seq.fill(20)("h") ++ ('a' to 'j').flatMap(c => Seq(c.toString, c.toString)),
    Seq.fill(15)("h") ++ ('k' to 't').flatMap(c => Seq(c.toString, c.toString)),
    Seq.fill(10)("h") ++ ('a' to 'j').flatMap(c => Seq(c.toString, c.toString)))

  test("streaming MG: bounded state, superset candidates, final output ≡ batch") {
    withTempDir { dir =>
      val src = s"$dir/src"; val ticksDir = s"$dir/ticks"; val cp = s"$dir/cp"
      deltas.zipWithIndex.foreach { case (toks, i) =>
        toks.toDF("k").coalesce(1).write.mode("append").parquet(src)
      }
      val schema = spark.read.parquet(src).schema
      val keys = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .select(pmod(xxhash64(col("k")), lit(2L)).cast("int").as("shard"),
          col("k"))
        .as[(Int, String)]
      val q = HeavyHitters.streamingShardSummaries(keys, capacity = 4)
        .toDF()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("append").parquet(ticksDir)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()

      val ticks = spark.read.parquet(ticksDir)
      // state bound: never more than capacity counters per (shard, tick)
      val maxPerTick = ticks.groupBy(col("shard"), col("tick"))
        .agg(count(lit(1)).as("c")).agg(max(col("c"))).as[Long].head()
      assert(maxPerTick <= 4L, s"state exceeded capacity: $maxPerTick")
      // 3 single-file batches → up to 3 ticks per shard, at least 2 each
      val nTicks = ticks.groupBy(col("shard")).agg(max(col("tick")))
        .as[(Int, Long)].collect().toMap
      assert(nTicks.values.forall(t => t >= 2L && t <= 3L), s"ticks: $nTicks")

      val cands = ticks
        .join(ticks.groupBy(col("shard")).agg(max(col("tick")).as("tick")),
          Seq("shard", "tick"))
        .select(col("key")).as[String].collect().toSet
      val all = deltas.flatten
      val n = all.size
      val trueHeavy = all.groupBy(identity).collect {
        case (k, occ) if occ.size * 5 > n => k
      }.toSet
      assert(trueHeavy == Set("h"))
      assert(trueHeavy.subsetOf(cands),
        s"superset guarantee violated: $trueHeavy not in $cands")

      // exact recount over streamed candidates ≡ one-shot batch operator
      val allDf = all.toDF("k")
      val streamedFinal = allDf.filter(col("k").isin(cands.toSeq: _*))
        .groupBy(col("k").as("key_out")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 5L > lit(n.toLong))
        .as[(String, Long)].collect().toSet
      val batchFinal = HeavyHitters.exactHeavyHitters(allDf, col("k"), 4)
        .as[(String, Long)].collect().toSet
      assert(streamedFinal == batchFinal && streamedFinal == Set(("h", 49L)))
    }
  }

  test("q385: the two planted needles and nothing else, exact counts") {
    val out = SparkEntry.queries("q385_streaming_heavy_hitters")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("needlea", "needleb"), s"got $out")
    assert(out("needlea") == 250L * 20 && out("needleb") == 250L * 18)
  }
}
