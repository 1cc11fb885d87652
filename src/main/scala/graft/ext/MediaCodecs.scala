package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Real, dependency-free media codecs for [[Multimodal]]: byte-level decoders
  * for two genuinely parseable formats — WAV/PCM audio (RIFF container,
  * 16-bit LE samples) and BMP images (BITMAPINFOHEADER, uncompressed 24 bpp) —
  * plus magic-byte sniffing and deterministic byte-statistics fallback for
  * anything else. Pure JVM: this container ships no codec libraries, but these
  * two formats are flat byte layouts a few dozen lines can decode exactly, so
  * the decode step is no longer a stub for them.
  *
  * Features are real signal features, not byte statistics:
  *  - WAV → per-window RMS amplitude of the decoded samples, normalized to
  *    [0, 1] (the standard cheap audio envelope).
  *  - BMP → per-window mean luminance (0.299 R + 0.587 G + 0.114 B) of the
  *    decoded pixels in row-major top-down order, normalized to [0, 1].
  *
  * Both run inside [[Multimodal.decodeFeatures]]'s per-partition iteration —
  * the plumbing (schema, batching, pruning) is unchanged; only the codec
  * behind the [[Multimodal.MediaCodec]] boundary got real.
  */
object MediaCodecs {

  /** Sniffed payload metadata in [[Multimodal.mediaSchema]]'s meta shape. */
  final case class MediaMeta(format: String, width: Option[Int], height: Option[Int],
                             nFrames: Option[Int], sampleRate: Option[Int])

  private def le(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)

  // -------------------------------------------------------------------------
  // WAV (RIFF/WAVE, PCM)
  // -------------------------------------------------------------------------

  /** Parsed PCM payload: format fields + raw 16-bit samples (channel-interleaved). */
  final case class WavData(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           samples: Array[Short])

  /** Strict RIFF/WAVE walk: "RIFF"<size>"WAVE", then chunks until "fmt " and
    * "data" are both seen. Returns None on anything malformed — callers fall
    * back to byte statistics rather than throwing on a corrupt payload (at
    * corpus scale some payloads WILL be truncated; a poison row must not kill
    * the partition). */
  def parseWav(bytes: Array[Byte]): Option[WavData] = {
    if (bytes.length < 44) return None
    val b = le(bytes)
    if (b.getInt(0) != 0x46464952 /* "RIFF" LE */ ) return None
    if (b.getInt(8) != 0x45564157 /* "WAVE" LE */ ) return None
    var pos = 12
    var rate, channels, bits = -1
    var data: Array[Short] = null
    while (pos + 8 <= bytes.length && (data == null || rate < 0)) {
      val id = b.getInt(pos)
      val size = b.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == 0x20746d66 /* "fmt " */ && size >= 16) {
        if (b.getShort(pos + 8) != 1) return None // PCM only
        channels = b.getShort(pos + 10).toInt
        rate = b.getInt(pos + 12)
        bits = b.getShort(pos + 22).toInt
        if (channels <= 0 || rate <= 0 || bits != 16) return None
      } else if (id == 0x61746164 /* "data" */ ) {
        val n = size / 2
        data = new Array[Short](n)
        var i = 0
        while (i < n) { data(i) = b.getShort(pos + 8 + 2 * i); i += 1 }
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate > 0 && data != null) Some(WavData(rate, channels, bits, data))
    else None
  }

  /** Real audio features: `dim` windows of RMS amplitude over the decoded
    * sample stream (channels mixed), each in [0, 1]. */
  object WavCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      parseWav(bytes) match {
        case None => StubFallback.decode(bytes, dim)
        case Some(w) =>
          val out = new Array[Float](dim)
          val n = w.samples.length
          if (n > 0) {
            val acc = new Array[Double](dim)
            val cnt = new Array[Int](dim)
            var i = 0
            while (i < n) {
              val slot = (i.toLong * dim / n).toInt
              val s = w.samples(i) / 32768.0
              acc(slot) += s * s; cnt(slot) += 1
              i += 1
            }
            var j = 0
            while (j < dim) {
              out(j) = if (cnt(j) == 0) 0f else math.sqrt(acc(j) / cnt(j)).toFloat
              j += 1
            }
          }
          out
      }
  }

  // -------------------------------------------------------------------------
  // BMP (BITMAPINFOHEADER, uncompressed 24 bpp)
  // -------------------------------------------------------------------------

  /** Parsed image: dimensions + row-major top-down luminance in [0, 1]. */
  final case class BmpData(width: Int, height: Int, luminance: Array[Float])

  /** Decode a 24 bpp uncompressed BMP: "BM", pixel-array offset at byte 10,
    * BITMAPINFOHEADER width/height, BGR triples in 4-byte-padded rows stored
    * bottom-up (positive height). None on any other BMP flavor or corruption. */
  def parseBmp(bytes: Array[Byte]): Option[BmpData] = {
    if (bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val b = le(bytes)
    val dataOffset = b.getInt(10)
    if (b.getInt(14) < 40) return None // header older than BITMAPINFOHEADER
    val width = b.getInt(18)
    val height = b.getInt(22)
    if (b.getShort(28) != 24 || b.getInt(30) != 0) return None // 24bpp, BI_RGB
    if (width <= 0 || height <= 0) return None
    val rowBytes = (width * 3 + 3) & ~3
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > bytes.length) return None
    val lum = new Array[Float](width * height)
    var y = 0
    while (y < height) {
      val row = dataOffset + (height - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < width) {
        val o = row + 3 * x
        val bl = bytes(o) & 0xff; val g = bytes(o + 1) & 0xff; val r = bytes(o + 2) & 0xff
        lum(y * width + x) = ((0.299 * r + 0.587 * g + 0.114 * bl) / 255.0).toFloat
        x += 1
      }
      y += 1
    }
    Some(BmpData(width, height, lum))
  }

  /** Real image features: `dim` windows of mean luminance over the decoded
    * pixels (row-major), each in [0, 1]. */
  object BmpCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      parseBmp(bytes) match {
        case None => StubFallback.decode(bytes, dim)
        case Some(img) =>
          val out = new Array[Float](dim)
          val n = img.luminance.length
          if (n > 0) {
            val acc = new Array[Double](dim)
            val cnt = new Array[Int](dim)
            var i = 0
            while (i < n) {
              val slot = (i.toLong * dim / n).toInt
              acc(slot) += img.luminance(i); cnt(slot) += 1
              i += 1
            }
            var j = 0
            while (j < dim) {
              out(j) = if (cnt(j) == 0) 0f else (acc(j) / cnt(j)).toFloat
              j += 1
            }
          }
          out
      }
  }

  /** Deterministic byte-statistics fallback for formats with no real decoder
    * here (JPEG/MP4/… would need actual codec libraries). Same math as the
    * original stub, so sniffing never changes behavior for unknown payloads. */
  object StubFallback extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      Multimodal.StubCodec.decode(bytes, dim)
  }

  /** Magic-byte dispatch: WAV and BMP decode for real; everything else falls
    * back to byte statistics. The production drop-in for
    * [[Multimodal.decodeFeatures]]'s codec parameter. */
  object SniffCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      sniffMeta(bytes).format match {
        case "audio/wav" => WavCodec.decode(bytes, dim)
        case "image/bmp" => BmpCodec.decode(bytes, dim)
        case _           => StubFallback.decode(bytes, dim)
      }
  }

  /** Identify a payload and extract its typed metadata (the meta struct of
    * [[Multimodal.mediaSchema]]). Unknown formats report octet-stream with no
    * dimensions. n_frames for audio = sample frames (samples / channels). */
  def sniffMeta(bytes: Array[Byte]): MediaMeta =
    parseWav(bytes) match {
      case Some(w) =>
        MediaMeta("audio/wav", None, None,
          Some(w.samples.length / math.max(1, w.channels)), Some(w.sampleRate))
      case None => parseBmp(bytes) match {
        case Some(img) =>
          MediaMeta("image/bmp", Some(img.width), Some(img.height), Some(1), None)
        case None => MediaMeta("application/octet-stream", None, None, None, None)
      }
    }

  // -------------------------------------------------------------------------
  // Encoders (tests/demos: build real payloads without external tools)
  // -------------------------------------------------------------------------

  /** Minimal canonical PCM WAV file (mono unless interleaved upstream). */
  def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(0x46464952).putInt(36 + dataSize).putInt(0x45564157) // RIFF size WAVE
    buf.putInt(0x20746d66).putInt(16) // "fmt ", PCM header size
    buf.putShort(1).putShort(channels.toShort).putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.putInt(0x61746164).putInt(dataSize) // "data"
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Minimal 24 bpp bottom-up BMP; `pixel(x, y)` returns (r, g, b) with y=0 at
    * the TOP (the encoder flips rows into BMP's bottom-up order). */
  def bmpBytes(width: Int, height: Int, pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
    buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // write bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  // -------------------------------------------------------------------------
  // Integer-exact media analytics (oracle-verifiable through the binary path)
  // -------------------------------------------------------------------------

  /** Audio stats from a REAL WAV payload, all integers so the full
    * synth→encode→parse→analyze pipeline hashes identically to a pure
    * arithmetic replay (q222): sample count, rate, peak |s|,
    * `rms_sq_micro = ⌊10⁶·Σs²/(n·32768²)⌋` (the RMS-squared ratio — RMS
    * itself needs a square root; its square is rational), and the count of
    * full-scale (clipped) samples. None on non-WAV bytes. */
  def audioStatsMilli(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] =
    parseWav(bytes).map { w =>
      val n = w.samples.length
      var peak = 0L; var sumSq = 0L; var clipped = 0L
      var i = 0
      while (i < n) {
        val v = w.samples(i).toLong
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v * v
        if (v == 32767L || v == -32768L) clipped += 1
        i += 1
      }
      val rms = if (n == 0) 0L else (1000000L * sumSq) / (n.toLong * 1073741824L)
      (n.toLong, w.sampleRate.toLong, peak, rms, clipped)
    }

  /** Integer BT.601 luma per pixel of a REAL 24 bpp BMP payload, row-major
    * top-down: `⌊(299·R + 587·G + 114·B)/1000⌋ ∈ [0, 255]`. The integer
    * sibling of [[parseBmp]]'s float luminance, for oracle-exact image
    * analytics. None on non-BMP bytes. */
  def parseBmpLumaInt(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val b = le(bytes)
    val dataOffset = b.getInt(10)
    if (b.getInt(14) < 40) return None
    val width = b.getInt(18); val height = b.getInt(22)
    if (b.getShort(28) != 24 || b.getInt(30) != 0) return None
    if (width <= 0 || height <= 0) return None
    val rowBytes = (width * 3 + 3) & ~3
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > bytes.length) return None
    val luma = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val row = dataOffset + (height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        val o = row + 3 * x
        val bl = bytes(o) & 0xff; val g = bytes(o + 1) & 0xff; val r = bytes(o + 2) & 0xff
        luma(y * width + x) = (299 * r + 587 * g + 114 * bl) / 1000
        x += 1
      }
      y += 1
    }
    Some((width, height, luma))
  }

  /** Luma histogram of a BMP payload: `nBuckets` equal byte-range buckets,
    * `bucket = ⌊luma·nBuckets/256⌋`. None on non-BMP bytes. */
  def lumaHistogram(bytes: Array[Byte], nBuckets: Int): Option[Array[Long]] =
    parseBmpLumaInt(bytes).map { case (_, _, luma) =>
      val out = new Array[Long](nBuckets)
      var i = 0
      while (i < luma.length) { out(luma(i) * nBuckets / 256) += 1; i += 1 }
      out
    }

  /** Integer area-downscale of a luma plane to a `gw`×`gh` grid: pixel
    * `(x, y)` lands in cell `(⌊x·gw/w⌋, ⌊y·gh/h⌋)` and each cell reports the
    * FLOOR mean of its pixels. The pixel→cell map (rather than cell→pixel
    * bounds) keeps the partition trivially replayable as `(x*gw) DIV w` in
    * any SQL engine — there is no resampling kernel to disagree about. */
  private def gridMeans(w: Int, h: Int, luma: Array[Int], gw: Int, gh: Int): Array[Int] = {
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val c = cy * gw + x * gw / w
        sums(c) += luma(y * w + x); cnts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => (sums(i) / cnts(i)).toInt)
  }

  /** 64-bit perceptual average-hash (aHash — public technique): decode →
    * BT.601 integer luma → 8×8 grid means → bit `cy·8+cx` set iff the cell
    * exceeds the grid mean (integer form `64·cell > Σcells`, no float mean).
    * Robust to uniform brightness shifts (cell and mean move together) and
    * to small local edits (one cell barely moves) — the cheap image
    * near-dup fingerprint; pair it with the SimHash Hamming pigeonhole
    * index for the join. None on non-BMP bytes or images under 8×8. */
  def aHash64(bytes: Array[Byte]): Option[Long] =
    parseBmpLumaInt(bytes).collect { case (w, h, luma) if w >= 8 && h >= 8 =>
      val g = gridMeans(w, h, luma, 8, 8)
      val tot = g.foldLeft(0L)(_ + _)
      (0 until 64).foldLeft(0L) { (acc, i) =>
        if (64L * g(i) > tot) acc | (1L << i) else acc
      }
    }

  /** 64-bit difference-hash (dHash — public technique): 9×8 grid means,
    * bit `cy·8+cx` set iff cell `(cx+1, cy)` is brighter than `(cx, cy)` —
    * the horizontal-gradient fingerprint, invariant to ANY monotone global
    * luma shift (only relative cell order matters). None on non-BMP bytes
    * or images under 9×8. */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    parseBmpLumaInt(bytes).collect { case (w, h, luma) if w >= 9 && h >= 8 =>
      val g = gridMeans(w, h, luma, 9, 8)
      (0 until 64).foldLeft(0L) { (acc, i) =>
        val cy = i / 8; val cx = i % 8
        if (g(cy * 9 + cx + 1) > g(cy * 9 + cx)) acc | (1L << i) else acc
      }
    }

  /** Linear-interpolating PCM resampler with an INTEGER phase accumulator:
    * output length `⌊n·to/from⌋`, sample `j` reads source phase
    * `p = j·from/to` as `(⌊p⌋, rem)` and interpolates
    * `s[p0] + ⌊(s[p0+1] − s[p0])·rem / to⌋` — bit-deterministic on any
    * engine/platform (no float phase drift), which is what lets a resample
    * step live inside a hash-verified pipeline. Mono input (mix upstream). */
  def resampleLinear(samples: Array[Short], from: Int, to: Int): Array[Short] = {
    require(from > 0 && to > 0, s"resampleLinear: rates must be positive ($from → $to)")
    val n = samples.length
    if (n == 0) return Array.empty
    val outLen = (n.toLong * to / from).toInt
    val out = new Array[Short](outLen)
    var j = 0
    while (j < outLen) {
      val num = j.toLong * from
      val p0 = (num / to).toInt
      val rem = num % to
      val a = samples(math.min(p0, n - 1)).toLong
      val b2 = samples(math.min(p0 + 1, n - 1)).toLong
      out(j) = (a + ((b2 - a) * rem) / to).toShort
      j += 1
    }
    out
  }

  /** 64-bit audio ENERGY-DELTA fingerprint — the WAV sibling of [[aHash64]]/
    * [[dHash64]], completing the multimodal near-dup story (text MinHash ✓,
    * image aHash/dHash ✓, audio this): decode 16-bit PCM, split the sample
    * stream into 65 TIME-ANCHORED frames of FIXED width `frameWidth`
    * (interleaved channels kept as-is — a stereo payload fingerprints its
    * interleaved stream; mix upstream to compare across layouts), per-frame
    * integer energy `E_f = Σ s²` (Long; safe while `frameWidth <
    * 2³³/32768² ≈ 8.5·10⁶` samples), bit `i` set iff `E_{i+1} > E_i` — the
    * dHash trick on the time axis.
    *
    * Robustness comes from the same relative-comparison argument as dHash:
    * a uniform gain `s → g·s` scales every frame energy by `g²`, preserving
    * every `>` comparison EXACTLY (no bit flips, including integer gains
    * that don't clip); small additive dither moves each `E_f` by
    * `O(2·dither·Σ|s| + frameWidth·dither²)`, flipping only bits whose
    * energy gap is tighter than that; and because frames are anchored to
    * the stream HEAD with fixed width (never length-relative), a tail clip
    * that leaves `≥ 65·frameWidth` samples does not move a single frame
    * boundary — fingerprint unchanged. (A HEAD clip misaligns every frame —
    * real pipelines probe a few head offsets; out of scope here.) Pairs
    * with the shared Hamming pigeonhole index
    * ([[graft.ext.Dedup.hammingNearDuplicates]]) exactly like the image
    * hashes. Integer-exact end to end, so an oracle replays
    * sample → frame → energy → bits bit-for-bit. None on non-WAV bytes or
    * payloads shorter than `(frames+1)·frameWidth` samples. */
  def audioHash64(bytes: Array[Byte], frameWidth: Int = 100): Option[Long] =
    parseWav(bytes).collect {
      case w if w.samples.length >= 65 * frameWidth =>
        val e = new Array[Long](65)
        var f = 0
        while (f < 65) {
          var i = f * frameWidth
          val end = i + frameWidth
          var acc = 0L
          while (i < end) {
            val v = w.samples(i).toLong
            acc += v * v
            i += 1
          }
          e(f) = acc
          f += 1
        }
        (0 until 64).foldLeft(0L) { (acc, i) =>
          if (e(i + 1) > e(i)) acc | (1L << i) else acc
        }
    }

  /** SHIFT-ROBUST variant of [[audioHash64]]: the same energy-delta hash
    * computed at every frame-granularity head offset `o = 0..probeFrames`
    * (probe `o` hashes the 65 frames starting at frame `o`), returned in
    * probe order. This closes [[audioHash64]]'s documented blind spot —
    * its frames are head-anchored, so a PREPENDED pad or head trim (the
    * most common real perturbation: intro padding, intro trim) flips
    * essentially every bit. With probes, a clip shifted by `k·frameWidth`
    * samples (k ≤ probeFrames) shares an EXACT probe alignment with its
    * original — probe `k` of the padded copy reads the identical sample
    * stream as probe 0 of the original, so the matched hash pair has
    * Hamming distance 0, not merely "small". Gain/dither/tail-clip
    * robustness is inherited per probe from [[audioHash64]]'s
    * relative-comparison argument, and the properties COMPOSE (a padded
    * AND gained copy still matches exactly).
    *
    * Honest bound: shifts that are NOT multiples of `frameWidth` misalign
    * every frame against every probe — on noise-like signal a sub-frame
    * shift of r samples moves each energy by ~r/frameWidth relative, so
    * recovery degrades; the knob is a finer `frameWidth` (cost linear in
    * probes·frames), the same trade every published audio-fingerprint
    * system (Shazam-style landmark or Philips-style subband) makes at its
    * own frame granularity.
    *
    * Scale: ONE energy pass over `65 + probeFrames` frames (energies are
    * shared across probes, not recomputed), `probeFrames + 1` output longs
    * per clip; downstream each probe row feeds the SAME Hamming pigeonhole
    * index ([[graft.ext.Dedup.hammingNearDuplicates]]) — per-clip index
    * fan-out is `probes × blocks`, bounded, and the verify stage takes the
    * MIN Hamming over probe pairs per clip pair (a keyed aggregate).
    * Probes that do not fit the payload (`(65+o)·frameWidth > samples`)
    * are simply absent, so a head-trimmed (shorter) copy still aligns via
    * the ORIGINAL's deeper probes. None on non-WAV bytes or payloads under
    * 65 full frames. */
  def audioHashProbes(bytes: Array[Byte], frameWidth: Int = 100,
                      probeFrames: Int = 4): Option[Array[Long]] = {
    require(frameWidth >= 1 && probeFrames >= 0,
      s"audioHashProbes: bad args ($frameWidth, $probeFrames)")
    parseWav(bytes).collect {
      case w if w.samples.length >= 65 * frameWidth =>
        val nf = w.samples.length / frameWidth
        val maxProbe = math.min(probeFrames, nf - 65)
        val e = new Array[Long](65 + maxProbe)
        var f = 0
        while (f < e.length) {
          var i = f * frameWidth
          val end = i + frameWidth
          var acc = 0L
          while (i < end) {
            val v = w.samples(i).toLong
            acc += v * v
            i += 1
          }
          e(f) = acc
          f += 1
        }
        Array.tabulate(maxProbe + 1) { o =>
          (0 until 64).foldLeft(0L) { (acc, i) =>
            if (e(o + i + 1) > e(o + i)) acc | (1L << i) else acc
          }
        }
    }
  }

  /** LANDMARK (peak-gap) audio fingerprint — the sub-frame-shift closer
    * [[audioHashProbes]] honestly declines: probes recover only shifts that
    * are MULTIPLES of `frameWidth`, because any other offset misaligns
    * every energy frame. Landmarks sidestep frames entirely (the Shazam
    * idea — Wang 2003 — hash relative geometry of signal peaks, which a
    * shift translates but never changes; realized here in the time domain
    * so the oracle can replay it integer-exactly):
    *
    *  - STRONG PEAKS: sample indices `i` (with a full window on both sides,
    *    `window ≤ i < n − window`) whose value is STRICTLY greater than
    *    every other sample in `[i−window, i+window]`. Strict dominance over
    *    a window — not a 3-point local max — for two reasons: it is
    *    SCALE-FREE (an amplitude threshold would break gain invariance),
    *    and it makes peaks SPARSE (~1 per `2·window` samples), so the gap
    *    alphabet is wide and a 4-gram key carries real entropy (3-point
    *    maxima on any signal produce gaps from a handful of small values —
    *    every clip shares every frequent pattern and the keyspace
    *    collapses; measured before this design was chosen);
    *  - GAPS: successive strong-peak index deltas `g(j) = p(j+1) − p(j)`
    *    (each ≥ window+1 by construction);
    *  - LANDMARK KEYS: every `ngram` consecutive gaps packed 15 bits each
    *    (capped at 32767) into one Long — key `j` is
    *    `Σ g(j+t) · 2^(15·(ngram−1−t))`, `ngram ≤ 4`.
    *
    * Invariances are EXACT, by construction, and compose: a shift by ANY
    * `r` (prepended pad or head trim — no frame-multiple caveat) translates
    * every interior strong peak by `r` and leaves every gap unchanged, so
    * all keys whose peak windows stay clear of the splice are identical; a
    * positive gain without clipping preserves every sample comparison, so
    * peaks — and therefore keys — are bit-identical. Matching is an
    * equi-join on the key (a blocked/banded scheme like the MinHash bands
    * and Hamming pigeonholes: per-key fan-out bounded, nothing all-pairs),
    * then a (id_a, id_b)-keyed shared-key count with a caller threshold;
    * key hubs (metronomic material) compose with the established over-cap
    * audit discipline. None on non-WAV bytes or payloads with fewer than
    * `ngram + 1` strong peaks. */
  def audioPeakGapLandmarks(bytes: Array[Byte], ngram: Int = 4,
                            window: Int = 32): Option[Array[Long]] = {
    require(ngram >= 1 && ngram <= 4,
      s"audioPeakGapLandmarks: ngram must be in 1..4, got $ngram")
    require(window >= 1,
      s"audioPeakGapLandmarks: window must be >= 1, got $window")
    parseWav(bytes).flatMap { w =>
      val s = w.samples
      val peaks = scala.collection.mutable.ArrayBuffer[Int]()
      var i = window
      while (i < s.length - window) {
        val v = s(i)
        var dominant = true
        var j = i - window
        while (dominant && j <= i + window) {
          if (j != i && s(j) >= v) dominant = false
          j += 1
        }
        if (dominant) peaks += i
        i += 1
      }
      val nKeys = peaks.length - ngram
      if (nKeys < 1) None
      else Some(Array.tabulate(nKeys) { j =>
        var key = 0L
        var t = 0
        while (t < ngram) {
          val gap = math.min(peaks(j + t + 1) - peaks(j + t), 32767).toLong
          key = (key << 15) | gap
          t += 1
        }
        key
      })
    }
  }

  /** Integer per-frame energies of a WAV payload: frame `f` is the exact
    * `Σ v²` over samples `[f·frameWidth, (f+1)·frameWidth)` (only FULL
    * frames; a trailing partial frame is dropped so a value never depends
    * on how much tail happened to remain). This is [[audioHash64]]'s energy
    * stage exposed as data instead of folded into delta bits — the input to
    * segmentation (voice-activity spans, silence trimming) where the hash's
    * 65-frame head anchor would be wrong: segmentation must see EVERY frame.
    *
    * Why this shape at 100 TB: decode + energy is one linear pass per row
    * with no per-row allocation beyond the output array (`len/frameWidth`
    * longs — a 1-hour 8 kHz clip is 288k longs, ~2 MB, bounded and far below
    * a decoded sample copy), and the downstream plan works on the exploded
    * `(clip, frame, energy)` table whose windows partition by clip — one
    * exchange keyed on the clip id, never on samples. Integer-exact so an
    * oracle replays sample → square → frame sum bit-for-bit. None on a
    * non-WAV payload. */
  def frameEnergies(bytes: Array[Byte], frameWidth: Int = 100): Option[Array[Long]] = {
    require(frameWidth >= 1, s"frameEnergies: frameWidth must be >= 1, got $frameWidth")
    parseWav(bytes).map { w =>
      val nf = w.samples.length / frameWidth
      Array.tabulate(nf) { f =>
        var i = f * frameWidth
        val end = i + frameWidth
        var acc = 0L
        while (i < end) { val v = w.samples(i).toLong; acc += v * v; i += 1 }
        acc
      }
    }
  }

  /** Per-frame [[aHash64]] of a GVID payload, in frame order — the input to
    * shot-boundary detection, where [[videoHash64]]'s whole-clip majority
    * vote is wrong by construction: a boundary IS a frame-to-frame change,
    * so every frame's own hash must survive to the plan. None on a non-GVID
    * payload or if any frame fails [[aHash64]] (a half-decoded hash array
    * would silently shift every downstream frame index).
    *
    * Why this shape at 100 TB: per-row cost is one decode pass (frames ×
    * pixels), output is `nFrames` longs — the exploded `(clip, frame,
    * hash)` table carries 16 bytes a frame instead of the payload, and the
    * boundary test is a `lag` window partitioned by clip: one exchange on
    * the clip id, bounded per-clip state, no payload bytes ever shuffled. */
  def videoFrameHashes(bytes: Array[Byte]): Option[Array[Long]] =
    parseVideoFrames(bytes).flatMap { frames =>
      val hs = frames.map(aHash64)
      if (hs.exists(_.isEmpty)) None else Some(hs.map(_.get))
    }

  /** Nearest-neighbor BMP thumbnail: pixel `(x, y)` of the `tw×th` output
    * samples source `(⌊x·w/tw⌋, ⌊y·h/th⌋)`; re-encoded as a real BMP via
    * [[bmpBytes]] so the output is itself a decodable payload. None on
    * non-BMP input. */
  def bmpThumbnail(bytes: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"bmpThumbnail: target dims must be positive ($tw×$th)")
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val b = le(bytes)
    val dataOffset = b.getInt(10)
    if (b.getInt(14) < 40) return None
    val width = b.getInt(18); val height = b.getInt(22)
    if (b.getShort(28) != 24 || b.getInt(30) != 0) return None
    if (width <= 0 || height <= 0) return None
    val rowBytes = (width * 3 + 3) & ~3
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > bytes.length) return None
    def rgbAt(x: Int, y: Int): (Int, Int, Int) = {
      val o = dataOffset + (height - 1 - y) * rowBytes + 3 * x
      (bytes(o + 2) & 0xff, bytes(o + 1) & 0xff, bytes(o) & 0xff)
    }
    Some(bmpBytes(tw, th, (x, y) =>
      rgbAt((x.toLong * width / tw).toInt, (y.toLong * height / th).toInt)))
  }

  // -------------------------------------------------------------------------
  // Video (GVID container: length-prefixed BMP frames)
  // -------------------------------------------------------------------------

  /** Minimal flat video container, the moving-picture sibling of the WAV/BMP
    * codecs above: `"GVID"` magic, LE frame count, then per frame an LE byte
    * length + the frame payload (a BMP from [[bmpBytes]]). Flat byte layout
    * on purpose — like WAV and BMP it is exactly decodable in a few dozen
    * dependency-free lines, so the video decode step is real, not a stub. */
  def videoBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "videoBytes: a video needs at least one frame")
    val buf = ByteBuffer
      .allocate(8 + frames.iterator.map(f => 4 + f.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  /** Strict GVID walk: magic + count, then length-prefixed frame payloads;
    * None on bad magic, a truncated frame, or a count the byte budget cannot
    * honor. Frames come back as raw payload bytes (decode each with the
    * image codecs). */
  def parseVideoFrames(bytes: Array[Byte]): Option[Array[Array[Byte]]] = {
    if (bytes.length < 8 || bytes(0) != 'G' || bytes(1) != 'V' ||
        bytes(2) != 'I' || bytes(3) != 'D') return None
    val b = le(bytes)
    val n = b.getInt(4)
    if (n <= 0) return None
    val out = new Array[Array[Byte]](n)
    var off = 8; var i = 0
    while (i < n) {
      if (off + 4 > bytes.length) return None
      val len = b.getInt(off); off += 4
      if (len < 0 || off + len > bytes.length) return None
      out(i) = java.util.Arrays.copyOfRange(bytes, off, off + len)
      off += len; i += 1
    }
    Some(out)
  }

  /** 64-bit video fingerprint completing the multimodal near-dup story
    * (text MinHash ✓, image aHash/dHash ✓, audio energy-delta ✓, video
    * this): decode the GVID container, sample HEAD-ANCHORED frames
    * `0, stride, 2·stride, …` capped at `maxSampled`, [[aHash64]] each
    * sampled frame, and set bit `b` iff a STRICT MAJORITY of sampled frames
    * set bit `b` (`2·cnt > n`; a tie leaves the bit clear — deterministic).
    *
    * Why this shape at 100 TB: the head-anchored cap bounds per-row decode
    * cost by `maxSampled` frames regardless of video length (a 2-hour
    * upload costs the same as a 10-second clip), and — the audio-hash
    * argument on the frame axis — a TAIL clip that leaves the sampled
    * index set intact does not move a single sampled frame, so the
    * fingerprint is bit-identical. The majority vote absorbs a minority of
    * re-encoded/edited frames (one overlaid frame among `n` flips only bits
    * whose vote was within one of the threshold), and per-frame aHash
    * absorbs uniform brightness shifts. Pairs with the shared Hamming
    * pigeonhole index ([[graft.ext.Dedup.hammingNearDuplicates]]) like the
    * image and audio hashes; integer-exact end to end so an oracle replays
    * pixel → grid → frame-bit → majority → bits exactly. None on a non-GVID
    * payload or if any sampled frame fails [[aHash64]].
    *
    * Head-shift BOUND (the audio-probe analysis applied here): a PREPENDED
    * or head-trimmed segment of `k` frames shifts the sampled index set, so
    * up to `⌈k/stride⌉` of the `n ≤ maxSampled` per-frame hashes are
    * replaced — a majority bit flips only if its vote margin was within
    * `2·⌈k/stride⌉`, so the whole-clip Hamming distance is bounded by the
    * number of near-tie bits, NOT by 64 (for a static-scene clip, most
    * votes are unanimous and the distance stays ≪ the q349 threshold).
    * When a corpus needs EXACT head-shift recovery instead of this bound,
    * use the per-frame path — [[videoFrameHashes]] rows joined through the
    * same pigeonhole index ([[graft.ext.Multimodal.shotSpans]]'s input) are
    * alignment-free, the video analogue of [[audioHashProbes]] with one
    * probe per frame. */
  def videoHash64(bytes: Array[Byte], stride: Int = 2,
                  maxSampled: Int = 8): Option[Long] = {
    require(stride >= 1, s"videoHash64: stride must be >= 1, got $stride")
    require(maxSampled >= 1, s"videoHash64: maxSampled must be >= 1, got $maxSampled")
    parseVideoFrames(bytes).flatMap { frames =>
      val hashes = frames.indices.by(stride).take(maxSampled)
        .map(i => aHash64(frames(i)))
      if (hashes.isEmpty || hashes.exists(_.isEmpty)) None
      else {
        val hs = hashes.map(_.get)
        val n = hs.length
        Some((0 until 64).foldLeft(0L) { (acc, b) =>
          val cnt = hs.count(h => ((h >>> b) & 1L) == 1L)
          if (2 * cnt > n) acc | (1L << b) else acc
        })
      }
    }
  }
}
