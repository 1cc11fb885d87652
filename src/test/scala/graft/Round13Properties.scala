package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.ext.MediaCodecs

/** Property sweeps for the round-13 video fingerprint: the container
  * round-trip is lossless for arbitrary payloads, sampling is truly
  * head-anchored (frames beyond the horizon can never move a bit), and the
  * majority vote degenerates to plain aHash when the sampled frames agree.
  */
class Round13Properties extends Properties("Round13Ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val payloadGen: Gen[List[Array[Byte]]] =
    Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 40).flatMap(len =>
        Gen.listOfN(len, Gen.choose(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray))))

  property("GVID round-trips arbitrary frame payloads byte-for-byte") =
    forAll(payloadGen) { frames =>
      val back = MediaCodecs.parseVideoFrames(MediaCodecs.videoBytes(frames)).get
      back.length == frames.length &&
        back.zip(frames).forall { case (a, b) => a.sameElements(b) }
    }

  private def frame(seed: Long, f: Int): Array[Byte] =
    MediaCodecs.bmpBytes(16, 12, (x, y) => (
      ((x * x * (3 + seed % 7) + y * (5 + seed % 11) + 19 * f) % 256).toInt,
      ((x * (2 + seed % 5) + y * y * (7 + seed % 3) + 23 * f) % 256).toInt,
      ((x * y * (3 + seed % 7) + 29 * f + 11 * seed) % 256).toInt))

  property("videoHash64 never reads past the sampling horizon") =
    forAll(Gen.choose(0L, 500L), Gen.choose(7, 12), Gen.choose(1, 5)) {
      (seed, n, extra) =>
        // stride 2, maxSampled 4 → sampled indices {0,2,4,6}; any video with
        // ≥ 7 frames has the full set, so appending frames must be invisible
        val base = (0 until n).map(frame(seed, _))
        val longer = base ++ (0 until extra).map(i => frame(seed + 999, n + i))
        MediaCodecs.videoHash64(MediaCodecs.videoBytes(base),
            stride = 2, maxSampled = 4) ==
          MediaCodecs.videoHash64(MediaCodecs.videoBytes(longer),
            stride = 2, maxSampled = 4)
    }

  property("majority vote over identical sampled frames IS that frame's aHash") =
    forAll(Gen.choose(0L, 500L), Gen.choose(7, 12)) { (seed, n) =>
      // only indices {0,2,4,6} are sampled: make THOSE identical, leave the
      // odd (unsampled) frames distinct — the vote must still be unanimous
      val one = frame(seed, 0)
      val frames = (0 until n).map(f => if (f % 2 == 0) one else frame(seed, f))
      MediaCodecs.videoHash64(MediaCodecs.videoBytes(frames),
          stride = 2, maxSampled = 4) ==
        MediaCodecs.aHash64(one)
    }
}
