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

  test("WAV codec: real RIFF/PCM parse, RMS envelope features, corrupt fallback") {
    import graft.ext.MediaCodecs
    // 1 second @ 8 kHz mono: first half silence, second half a full-scale
    // square wave => envelope [0, ~1].
    val samples = Array.tabulate[Short](8000) { i =>
      if (i < 4000) 0 else if (i % 2 == 0) 32767 else -32767
    }
    val wav = MediaCodecs.wavBytes(8000, 1, samples)
    val parsed = MediaCodecs.parseWav(wav).get
    assert(parsed.sampleRate == 8000 && parsed.channels == 1 &&
      parsed.bitsPerSample == 16 && parsed.samples.length == 8000)
    assert(parsed.samples.take(4000).forall(_ == 0))

    val f = MediaCodecs.WavCodec.decode(wav, 4)
    assert(f.length == 4 && f(0) == 0f && f(1) == 0f)
    assert(math.abs(f(2) - 1.0) < 1e-3 && math.abs(f(3) - 1.0) < 1e-3)

    val meta = MediaCodecs.sniffMeta(wav)
    assert(meta.format == "audio/wav" && meta.sampleRate.contains(8000) &&
      meta.nFrames.contains(8000))
    // Truncated payload: parse rejects, codec falls back to byte stats.
    assert(MediaCodecs.parseWav(wav.take(30)).isEmpty)
    assert(MediaCodecs.SniffCodec.decode(wav.take(30), 4).toSeq ==
      Multimodal.StubCodec.decode(wav.take(30), 4).toSeq)
  }

  test("BMP codec: real 24bpp decode, luminance features, top-down order") {
    import graft.ext.MediaCodecs
    // 4x2 image: top row black, bottom row white — proves the bottom-up BMP
    // rows are flipped back to top-down before feature windows.
    val bmp = MediaCodecs.bmpBytes(4, 2, (_, y) => if (y == 0) (0, 0, 0) else (255, 255, 255))
    val img = MediaCodecs.parseBmp(bmp).get
    assert(img.width == 4 && img.height == 2)
    assert(img.luminance.take(4).forall(_ == 0f))
    assert(img.luminance.drop(4).forall(l => math.abs(l - 1f) < 1e-3))

    val f = MediaCodecs.BmpCodec.decode(bmp, 2)
    assert(f(0) == 0f && math.abs(f(1) - 1f) < 1e-3)

    val meta = MediaCodecs.sniffMeta(bmp)
    assert(meta.format == "image/bmp" && meta.width.contains(4) && meta.height.contains(2))
    // 8bpp/corrupt BMPs are rejected, not mis-decoded.
    assert(MediaCodecs.parseBmp(bmp.take(40)).isEmpty)
  }

  test("extractMeta + decodeFeatures(SniffCodec) run real codecs through the Spark plumbing") {
    import graft.ext.MediaCodecs
    import org.apache.spark.sql.Row
    val wav = MediaCodecs.wavBytes(16000, 1, Array.tabulate[Short](1600)(i =>
      (math.sin(i * 2 * math.Pi * 440 / 16000) * 16384).toShort))
    val bmp = MediaCodecs.bmpBytes(8, 8, (x, y) => ((x * 32) % 256, (y * 32) % 256, 128))
    val blob = "not-a-media-file".getBytes("UTF-8")
    val rows = Seq(Row(0L, wav, null), Row(1L, bmp, null), Row(2L, blob, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)

    val metas = Multimodal.extractMeta(df).select("media_id", "meta.*")
      .orderBy("media_id").collect()
    assert(metas(0).getAs[String]("format") == "audio/wav" &&
      metas(0).getAs[Int]("sample_rate") == 16000)
    assert(metas(1).getAs[String]("format") == "image/bmp" &&
      metas(1).getAs[Int]("width") == 8 && metas(1).getAs[Int]("height") == 8)
    assert(metas(2).getAs[String]("format") == "application/octet-stream")

    val feats = Multimodal.decodeFeatures(df, dim = 4, codec = MediaCodecs.SniffCodec)
      .orderBy("media_id").collect()
    // 440 Hz sine at half scale: every window's RMS ≈ 0.5/√2 ≈ 0.3536
    val wavFeat = feats(0).getAs[scala.collection.Seq[Float]]("feature")
    assert(wavFeat.forall(v => math.abs(v - 0.3536f) < 0.01f))
    // unknown format must keep byte-identical stub behavior
    assert(feats(2).getAs[scala.collection.Seq[Float]]("feature").toSeq ==
      Multimodal.StubCodec.decode(blob, 4).toSeq)
  }

  test("audioStatsMilli: integer stats through a real WAV roundtrip") {
    import graft.ext.MediaCodecs
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 100)
    val bytes = MediaCodecs.wavBytes(8000, 1, samples)
    val Some((n, rate, peak, rms, clipped)) = MediaCodecs.audioStatsMilli(bytes)
    assert((n, rate, peak, clipped) === ((6L, 8000L, 32768L, 2L)))
    val sumSq = samples.map(s => s.toLong * s.toLong).sum
    assert(rms === 1000000L * sumSq / (6L * 1073741824L))
    assert(MediaCodecs.audioStatsMilli("not a wav".getBytes).isEmpty)
  }

  test("resampleLinear: integer phase accumulator on a known ramp") {
    import graft.ext.MediaCodecs
    // ramp 0,10,20,30 resampled 2:1 -> length 2: j=0 -> 0; j=1 -> s[2]=20
    assert(MediaCodecs.resampleLinear(Array[Short](0, 10, 20, 30), 8000, 4000).toSeq
      === Seq[Short](0, 20))
    // 1:2 upsample interpolates midpoints: 0,5,10,15,20,25,30,30
    assert(MediaCodecs.resampleLinear(Array[Short](0, 10, 20, 30), 4000, 8000).toSeq
      === Seq[Short](0, 5, 10, 15, 20, 25, 30, 30))
    // identity
    assert(MediaCodecs.resampleLinear(Array[Short](7, -9), 44100, 44100).toSeq
      === Seq[Short](7, -9))
  }

  test("lumaHistogram and parseBmpLumaInt agree with direct pixel arithmetic") {
    import graft.ext.MediaCodecs
    val w = 6; val h = 5
    def px(x: Int, y: Int) = ((x * 40) % 256, (y * 50) % 256, 128)
    val bytes = MediaCodecs.bmpBytes(w, h, px)
    val Some((pw, ph, luma)) = MediaCodecs.parseBmpLumaInt(bytes)
    assert((pw, ph) === ((w, h)))
    val expected = for (y <- 0 until h; x <- 0 until w) yield {
      val (r, g, b) = px(x, y); (299 * r + 587 * g + 114 * b) / 1000
    }
    assert(luma.toSeq === expected)
    val hist = MediaCodecs.lumaHistogram(bytes, 8).get
    assert(hist.sum === (w * h).toLong)
    assert(hist.toSeq === (0 until 8).map(b =>
      expected.count(l => l * 8 / 256 == b).toLong))
  }

  test("bmpThumbnail re-encodes a decodable BMP with nearest-neighbor pixels") {
    import graft.ext.MediaCodecs
    val bytes = MediaCodecs.bmpBytes(8, 8, (x, y) => (x * 30, y * 30, (x + y) * 15))
    val thumb = MediaCodecs.bmpThumbnail(bytes, 4, 4).get
    val Some((tw, th, luma)) = MediaCodecs.parseBmpLumaInt(thumb)
    assert((tw, th) === ((4, 4)))
    // thumbnail pixel (x,y) sources (2x, 2y): check corner + interior
    def srcLuma(x: Int, y: Int) = {
      val (r, g, b) = (x * 30, y * 30, (x + y) * 15)
      (299 * r + 587 * g + 114 * b) / 1000
    }
    assert(luma(0) === srcLuma(0, 0))
    assert(luma(1 * 4 + 2) === srcLuma(4, 2))
    assert(MediaCodecs.bmpThumbnail("nope".getBytes, 2, 2).isEmpty)
  }
}
