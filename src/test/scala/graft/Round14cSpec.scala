package graft

import org.apache.spark.sql.functions._
import graft.ext.MediaCodecs

/** Round-14 specs, part 3: the shift-robust audio fingerprint
  * (probe/audioHash64 agreement, exact recovery of head-padded and
  * head-trimmed copies, composition with gain). */
class Round14cSpec extends SparkSpec {
  import spark.implicits._

  private def baseSample(i: Int, id: Long): Long =
    ((i.toLong * i * (3 + id % 5) + i.toLong * (7 + id % 11) + 13L * id)
      % 20001L) - 10000L

  private def baseClip(id: Long): Array[Short] =
    Array.tabulate((6800 + (id % 7) * 20).toInt)(i => baseSample(i, id).toShort)

  private def wav(s: Array[Short]): Array[Byte] =
    MediaCodecs.wavBytes(8000, 1, s)

  private def minHam(a: Array[Long], b: Array[Long]): Int =
    (for (x <- a; y <- b) yield java.lang.Long.bitCount(x ^ y)).min

  test("audioHashProbes: probe 0 IS audioHash64; probe count tracks payload length") {
    val s = baseClip(2L)
    val probes = MediaCodecs.audioHashProbes(wav(s)).get
    assert(probes.head == MediaCodecs.audioHash64(wav(s)).get)
    // 6840 samples = 68 full frames → probes 0..3 fit, probe 4 does not
    assert(probes.length == 4)
    val exact65 = MediaCodecs.audioHashProbes(wav(s.take(6500))).get
    assert(exact65.length == 1, "a 65-frame payload has only probe 0")
    assert(MediaCodecs.audioHashProbes("nope".getBytes).isEmpty)
  }

  test("audioHashProbes: a 2-frame prepend is recovered at Hamming 0 (audioHash64 is not)") {
    val s = baseClip(7L)
    val padded = Array.tabulate(s.length + 200) { i =>
      if (i < 200) (((i.toLong * 11 + 7L) % 2001L) - 1000L).toShort else s(i - 200)
    }
    val pOrig = MediaCodecs.audioHashProbes(wav(s)).get
    val pPad = MediaCodecs.audioHashProbes(wav(padded)).get
    assert(minHam(pOrig, pPad) == 0,
      "probe 2 of the padded copy reads the identical sample stream as probe 0 of the original")
    // the single head-anchored hash, by contrast, is scrambled
    val single = java.lang.Long.bitCount(
      MediaCodecs.audioHash64(wav(s)).get ^ MediaCodecs.audioHash64(wav(padded)).get)
    assert(single > 16, s"head-anchored hash should scramble under a prepend, got $single")
  }

  test("audioHashProbes: a 1-frame head trim is recovered at Hamming 0 via the original's deeper probe") {
    val s = baseClip(11L)
    val trimmed = s.drop(100)
    assert(minHam(MediaCodecs.audioHashProbes(wav(s)).get,
      MediaCodecs.audioHashProbes(wav(trimmed)).get) == 0)
  }

  test("audioHashProbes: prepend + 2x gain still matches exactly (robustness composes)") {
    val s = baseClip(13L)
    val padGain = Array.tabulate(s.length + 300) { i =>
      if (i < 300) (((i.toLong * 5 + 13L) % 1501L) - 750L).toShort
      else (2 * s(i - 300)).toShort // |s| <= 10000 → no clipping
    }
    assert(minHam(MediaCodecs.audioHashProbes(wav(s)).get,
      MediaCodecs.audioHashProbes(wav(padGain)).get) == 0)
  }

  test("q381: exactly the 36 planted pairs, every one at min Hamming 0") {
    val rows = SparkEntry.queries("q381_audio_shift_robust")(spark, "unused")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 36, s"got ${rows.length} pairs")
    assert(rows.forall(_._3 == 0L), "every planted pair aligns exactly at some probe")
    val expected = (0L until 48L by 4L).flatMap(id =>
      Seq((id, id + 1000L), (id, id + 2000L), (id + 1000L, id + 2000L))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == expected)
  }
}
