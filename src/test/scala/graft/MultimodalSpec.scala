package graft

import graft.ext.Multimodal

/** Multimodal binary-column plumbing: schema, per-partition decode batching,
  * metadata-driven frame sampling and resize math (codec itself is stubbed —
  * see Multimodal.StubCodec). */
class MultimodalSpec extends SparkSpec {

  test("decodeFeatures produces deterministic features with the declared schema") {
    val media = Multimodal.syntheticMedia(spark, 8)
    val feats = Multimodal.decodeFeatures(media, dim = 4)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 8)
    val r0 = rows.head
    assert(r0.getAs[Long]("byte_len") == "media-payload-0-".length.toLong)
    assert(r0.getAs[Double]("mean_byte") > 0)
    assert(r0.getAs[scala.collection.Seq[Float]]("feature").length == 4)
    // deterministic: same input → same features
    val again = Multimodal.decodeFeatures(media, dim = 4).orderBy("media_id").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("metadata-only queries never read the payload column (parquet column pruning)") {
    withTempDir { dir =>
      Multimodal.syntheticMedia(spark, 4).write.parquet(s"$dir/media")
      val q = spark.read.parquet(s"$dir/media").select("media_id", "meta.width")
      val scan = q.queryExecution.executedPlan.toString
      val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse(scan)
      assert(readSchema.contains("media_id") && !readSchema.contains("media:binary"),
        s"payload column must be pruned from the scan: $readSchema")
    }
  }

  test("sampleFrames explodes every stride-th frame with byte slices") {
    val media = Multimodal.syntheticMedia(spark, 2)
    val frames = Multimodal.sampleFrames(media, stride = 2).orderBy("media_id", "frame_idx").collect()
    // 4 frames per media, stride 2 → frames 0 and 2 per media
    assert(frames.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx"))).toSeq ==
      Seq((0L, 0), (0L, 2), (1L, 0), (1L, 2)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").nonEmpty))
  }

  test("resizePlan preserves aspect ratio within the target box") {
    val media = Multimodal.syntheticMedia(spark, 1) // 64x48
    val plan = Multimodal.resizePlan(media, maxSide = 32).collect().head
    assert(plan.getAs[Int]("target_width") == 32)
    assert(plan.getAs[Int]("target_height") == 24)
  }
}
