package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, processed per-partition in bounded batches.
  *
  * The Spark-side mechanics — schema, partition sizing, batch iteration, feature
  * schema — are real and tested. The codec boundary is [[MediaCodec]]; behind it,
  * [[MediaCodecs.SniffCodec]] REALLY decodes WAV/PCM audio and 24 bpp BMP images
  * (pure-JVM byte parsing, RMS-envelope / luminance features — see
  * [[MediaCodecs]]) and falls back to [[StubCodec]]'s deterministic
  * byte-statistics only for formats that would need an external codec library
  * (JPEG, MP4, …), which this container does not ship.
  *
  * Scale notes: media rows are large, so ops run via `mapPartitions` over an
  * iterator (never materializing a partition), and callers should size input
  * partitions by bytes (`spark.sql.files.maxPartitionBytes`), not row count.
  * Columnar parquet keeps metadata-only queries from ever reading the blob column
  * (column pruning: a `select(meta.*)` never touches `media`).
  */
object Multimodal {

  /** Canonical media-table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Decoded-feature schema produced by [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType),
    StructField("mean_byte", DoubleType),
    StructField("feature", ArrayType(FloatType))))

  /** Pluggable decode step. Production: wrap an image/audio codec here.
    * [[StubCodec]] is the deterministic fake used in this environment. */
  trait MediaCodec extends Serializable {
    /** bytes → fixed-width feature vector (e.g. pixels → embedding). */
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stand-in for a real decoder: features are byte-window means.
    * Replace with a real codec in production — the Spark plumbing is unchanged. */
  object StubCodec extends MediaCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes.nonEmpty) {
        var i = 0
        while (i < bytes.length) {
          out(i % dim) += (bytes(i) & 0xff).toFloat
          i += 1
        }
        val perSlot = math.max(1, bytes.length / dim)
        var j = 0
        while (j < dim) { out(j) /= perSlot.toFloat; j += 1 }
      }
      out
    }
  }

  /** Decode/feature-extract: binary column → feature vectors, per-partition batch
    * iteration (the Scala analog of a pandas-batched UDF — one codec instance per
    * partition, streaming through rows). */
  def decodeFeatures(media: DataFrame, dim: Int = 16,
                     codec: MediaCodec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val mean = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
        Row(id, bytes.length.toLong, mean, codec.decode(bytes, dim).toIndexedSeq)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  /** Sniff real payloads into the typed meta struct: WAV and BMP are parsed
    * for real ([[MediaCodecs.sniffMeta]] — sample rate, frame count, pixel
    * dimensions from the actual bytes); unknown formats get format-only
    * metadata. Codec boundary, so per-partition iteration like
    * [[decodeFeatures]]. */
  def extractMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select(col("media_id"), col("media")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val m = MediaCodecs.sniffMeta(bytes)
        Row(id, bytes, Row(m.format,
          m.width.map(Int.box).orNull, m.height.map(Int.box).orNull,
          m.nFrames.map(Int.box).orNull, m.sampleRate.map(Int.box).orNull))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame's byte slice,
    * driven entirely by metadata (`meta.n_frames`) — pure expressions, no decode. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(coalesce(col("meta.n_frames"), lit(1)) - 1, lit(0)), lit(stride))))
      .withColumn("frame_bytes", {
        val frameSize = (length(col("media")) / greatest(coalesce(col("meta.n_frames"), lit(1)), lit(1)))
          .cast("int")
        col("media").substr((col("frame_idx") * frameSize + 1).cast("int"), frameSize)
      })
      .select("media_id", "frame_idx", "frame_bytes")

  /** Metadata-derived resize plan (target box, preserving aspect) — demonstrates
    * typed-metadata math without touching payloads; the actual pixel resample lives
    * behind [[MediaCodec]] in production. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double"); val h = col("meta.height").cast("double")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    media.select(col("media_id"),
      round(w * scale).cast("int").as("target_width"),
      round(h * scale).cast("int").as("target_height"))
  }

  /** Voice-activity spans over a per-frame energy table — energy-threshold
    * VAD, the canonical silence-trim / speech-segmentation pass of an audio
    * curation pipeline (frames from [[MediaCodecs.frameEnergies]], exploded
    * to one row per `(clip, frame, energy)`). A frame is ACTIVE iff
    * `energy > thresholdEnergy`; maximal runs of consecutive active frames
    * become spans via gaps-and-islands (`frame − row_number` over the
    * active frames of a clip is constant exactly on a run). Output: one row
    * per span — clip id, `span_start` / `span_end` (inclusive frame
    * indices), `n_frames`, and the span's total `span_energy`.
    *
    * Why this shape at 100 TB: the ONLY exchange is the window/groupBy key
    * — the clip id — so the pass scales with clips, not samples; per-clip
    * window state is the clip's own active frames (bounded by clip length,
    * independent of corpus size), and the integer threshold + integer
    * energies make every span endpoint oracle-replayable. No payload bytes
    * reach this plan — decode happened upstream and shipped 8 bytes a
    * frame. */
  def vadSpans(frameEnergies: DataFrame, idCol: String, frameCol: String,
               energyCol: String, thresholdEnergy: Long): DataFrame = {
    val active = frameEnergies
      .where(col(energyCol) > thresholdEnergy)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(frameCol))
    active
      .withColumn("__grp", col(frameCol) - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(
        min(col(frameCol)).cast("long").as("span_start"),
        max(col(frameCol)).cast("long").as("span_end"),
        count(lit(1)).as("n_frames"),
        sum(col(energyCol)).as("span_energy"))
      .drop("__grp")
  }

  /** Shot-boundary segmentation over a per-frame hash table (hashes from
    * [[MediaCodecs.videoFrameHashes]], exploded to one row per `(clip,
    * frame, hash)`): a boundary opens wherever the Hamming distance to the
    * PREVIOUS frame's hash exceeds `maxDistance` (frame 0 always opens a
    * shot), and `shot = Σ boundary` over the frame order numbers shots
    * 1, 2, … per clip. Output: one row per shot — clip id, `shot`,
    * `start_frame` / `end_frame` (inclusive), `n_frames`.
    *
    * Why this shape at 100 TB: `lag` + running sum + the span aggregate all
    * share ONE window partitioning on the clip id, so the whole pass is a
    * single exchange of 16-byte frame rows; per-clip state is one previous
    * hash and a counter. The aHash behind the distance absorbs uniform
    * brightness shifts, so re-graded scenes don't fragment; a hard cut
    * moves many grid cells at once and lands far above any sensible
    * threshold. Integer-exact end to end (pixel → grid → bits → popcount),
    * so an oracle replays every boundary decision. */
  def shotSpans(frameHashes: DataFrame, idCol: String, frameCol: String,
                hashCol: String, maxDistance: Int): DataFrame = {
    require(maxDistance >= 0 && maxDistance < 64,
      s"shotSpans: maxDistance must be in [0, 64), got $maxDistance")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(frameCol))
    val prev = lag(col(hashCol), 1).over(w)
    val boundary = when(prev.isNull, lit(1L))
      .when(bit_count(expr(s"$hashCol ^ __prev")) > maxDistance, lit(1L))
      .otherwise(lit(0L))
    frameHashes
      .withColumn("__prev", prev)
      .withColumn("__b", boundary)
      .withColumn("shot", sum(col("__b")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("shot"))
      .agg(
        min(col(frameCol)).cast("long").as("start_frame"),
        max(col(frameCol)).cast("long").as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** Build a small deterministic media table from strings (tests/demos). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val payload = (s"media-payload-$i-" * (i + 1)).getBytes("UTF-8")
      Row(i.toLong, payload, Row("fake/raw", 64 + i, 48 + i, 4, 16000))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, math.max(1, n / 4)), mediaSchema)
  }
}
