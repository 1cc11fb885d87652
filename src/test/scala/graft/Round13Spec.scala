package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, MediaCodecs, Similarity}

/** Round-13 specs: the audio energy-delta fingerprint (multimodal dedup's
  * last modality), the NN-descent convergence loop, the one-pipeline
  * streaming medallion+LSH tick, and the substring-dedup hash-then-verify
  * rewrite's no-false-positive guard. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------- MediaCodecs.audioHash64

  /** The q344 generator: pseudo-random PCM per id, ~6.8k samples. */
  private def baseSample(i: Int, id: Long): Long =
    ((i.toLong * i * (3 + id % 5) + i.toLong * (7 + id % 11) + 13L * id)
      % 20001L) - 10000L

  private def baseClip(id: Long): Array[Short] =
    Array.tabulate((6800 + (id % 7) * 20).toInt)(i => baseSample(i, id).toShort)

  test("audioHash64: rejects non-WAV bytes and payloads under 65 frames") {
    assert(MediaCodecs.audioHash64("not a wav".getBytes).isEmpty)
    val short = MediaCodecs.wavBytes(8000, 1, Array.fill(64 * 100)(123.toShort))
    assert(MediaCodecs.audioHash64(short).isEmpty)
    val justEnough = MediaCodecs.wavBytes(8000, 1, Array.fill(65 * 100)(123.toShort))
    assert(MediaCodecs.audioHash64(justEnough).isDefined)
  }

  test("audioHash64: uniform integer gain flips zero bits (relative-comparison invariance)") {
    val s = baseClip(3L)
    val gained = s.map(v => (v * 3).toShort) // |v| ≤ 10000 → no clipping
    val h1 = MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, s)).get
    val h2 = MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, gained)).get
    assert(h1 === h2, "gain scales every frame energy by g² — no comparison may flip")
  }

  test("audioHash64: tail clip beyond the 65-frame horizon is invisible (head-anchored frames)") {
    val s = baseClip(5L)
    val clipped = s.take(6500) // exactly the hash horizon
    val h1 = MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, s)).get
    val h2 = MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, clipped)).get
    assert(h1 === h2)
  }

  test("audioHash64: q344 fixture separates planted copies from distinct clips") {
    val sigs = (0L until 48L).flatMap { id =>
      val orig = (id, MediaCodecs.audioHash64(
        MediaCodecs.wavBytes(8000, 1, baseClip(id))).get)
      if (id % 4 == 0) {
        val pert = Array.tabulate(6600) { i =>
          (2L * baseSample(i, id) + ((i * 7 + id) % 9L) - 4L).toShort
        }
        Seq(orig, (id + 1000L,
          MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, pert)).get))
      } else Seq(orig)
    }
    val byId = sigs.toMap
    val plantedDists = (0L until 48L by 4L).map { id =>
      java.lang.Long.bitCount(byId(id) ^ byId(id + 1000L))
    }
    assert(plantedDists.forall(_ <= 7),
      s"every planted copy must sit within the pinned threshold 7: $plantedDists")
    val distinctDists = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && ib != ia + 1000L
    } yield java.lang.Long.bitCount(sa ^ sb)
    assert(distinctDists.min > 7,
      s"no distinct pair may fall inside the threshold (min=${distinctDists.min})")
  }

  test("audioHash64 through hammingNearDuplicates recovers exactly the 12 planted pairs") {
    val sigs = (0L until 48L).flatMap { id =>
      val orig = (id, MediaCodecs.audioHash64(
        MediaCodecs.wavBytes(8000, 1, baseClip(id))).get)
      if (id % 4 == 0) {
        val pert = Array.tabulate(6600) { i =>
          (2L * baseSample(i, id) + ((i * 7 + id) % 9L) - 4L).toShort
        }
        Seq(orig, (id + 1000L,
          MediaCodecs.audioHash64(MediaCodecs.wavBytes(8000, 1, pert)).get))
      } else Seq(orig)
    }.toDF("media_id", "afp")
    val got = Dedup.hammingNearDuplicates(sigs, "media_id", "afp",
        maxDistance = 7, bits = 64)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val want = (0L until 48L by 4L).map(id => (id, id + 1000L)).toSet
    assert(got === want)
  }

  // --------------------------- Dedup substring two-pass: no false positives

  test("duplicateSubstringSpans: a duplicate-free corpus yields zero spans (verify pass is load-bearing)") {
    // Guards the hash-then-verify rewrite: a regression that trusted the
    // 60-bit candidate pass without the exact string verify would still
    // pass the planted-duplicate tests but could invent spans; a corpus
    // with no repeated window must produce NOTHING either way.
    val corpus = Seq(
      (1L, "every window in this sentence is unique across the corpus"),
      (2L, "and nothing here repeats anything from the first one at all"),
      (3L, "0123456789 abcdefghij klmnopqrst uvwxyz fresh disjoint text"))
    assert(Dedup.duplicateSubstringSpans(corpus.toDF("doc_id", "text"),
      minLen = 10).count() === 0L)
    assert(Dedup.duplicateSubstringSpansKeepFirst(corpus.toDF("doc_id", "text"),
      minLen = 10).count() === 0L)
  }

  // ------------------------------------- Similarity.nnDescentConverge

  /** Deterministic pseudo-random unit-ish vectors, 64-dim (the production
    * embedding width; lshBucket requires it). */
  private def vecs(n: Int, seed: Long): Seq[(Long, Seq[Float])] =
    (1L to n.toLong).map { id =>
      id -> (0 until 64).map { d =>
        val m = (id * 2654435761L + d * 40503L + seed * 9176L + id * d * 137L) % 1009L
        (m - 504L).toFloat / 504f
      }
    }

  test("nnDescentConverge: terminates early when a round adds no edges") {
    // 8 vectors, k=7: any seed already connects so densely that one NoN
    // round reaches the complete graph; the following round adds nothing
    // and the loop must stop well before maxRounds.
    val emb = vecs(8, 1L).toDF("vec_id", "embedding")
    val stages = Similarity.nnDescentConverge(emb, k = 7, bits = 2,
      salts = Seq(0L, 1L), maxRounds = 10, minNewPermille = 10L)
    assert(stages.last.nNew * 1000L <= 10L * stages.last.nEdges,
      s"loop must stop on the δ rule: ${stages.map(s => (s.round, s.nNew))}")
    assert(stages.length < 11, "must not run all 10 rounds on a converged graph")
    assert(stages.map(_.round) === stages.indices.toSeq, "rounds number 0..R")
  }

  test("nnDescentConverge: recall vs exact top-k is monotone non-decreasing") {
    val emb = vecs(60, 7L).toDF("vec_id", "embedding")
    val k = 3
    val exact = Similarity.knnJoin(emb, emb, k)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    val stages = Similarity.nnDescentConverge(emb, k, bits = 3,
      salts = Seq(0L, 1L), maxRounds = 3, minNewPermille = 0L)
    val recalls = stages.map { st =>
      st.graph.as[(Long, Long)].collect().count(exact.contains)
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must be monotone across rounds: $recalls")
    assert(recalls.last > recalls.head || recalls.head == exact.size,
      s"refinement must improve an imperfect seed: $recalls vs exact ${exact.size}")
    // every stage keeps exactly k edges per node (top-k contract)
    stages.foreach { st => assert(st.nEdges === st.graph.count()) }
  }

  test("nnDescentConverge: minNewPermille=0 stops only at a true fixed point or maxRounds") {
    val emb = vecs(20, 3L).toDF("vec_id", "embedding")
    val stages = Similarity.nnDescentConverge(emb, k = 4, bits = 4,
      salts = Seq(0L, 1L), maxRounds = 6, minNewPermille = 0L)
    if (stages.length < 7) // stopped early ⇒ the last round changed NOTHING
      assert(stages.last.nNew === 0L)
  }

  // ------------------------------ Dedup.streamingMedallionLshTick

  test("streamingMedallionLshTick: clean→validate→index→pairs in one pass; dirt quarantined, pairs ≡ batch probe") {
    withTempDir { root =>
      val base = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "one two three four five six seven eight nine"),
        (3L, "completely different text about spark engines here"))
        .toDF("doc_id", "text")
      // deltas: a near-dup of doc 1 (untrimmed — the clean step must trim),
      // a TOO-SHORT fragment (must quarantine, never index), a null-id row
      // (same), and one novel valid doc
      val d1 = Seq(
        (java.lang.Long.valueOf(101L), "  beta gamma delta epsilon zeta eta theta  "),
        (java.lang.Long.valueOf(102L), "too short")).toDF("doc_id", "text")
      val d2 = Seq(
        (null.asInstanceOf[java.lang.Long], "a null id row that is long enough to pass length"),
        (java.lang.Long.valueOf(201L), "a wholly novel document with fresh words inside"))
        .toDF("doc_id", "text")
      d1.coalesce(1).write.mode("append").parquet(s"$root/landing")
      d2.coalesce(1).write.mode("append").parquet(s"$root/landing")
      Dedup.lshIndexBuild(base, s"$root/idx", batch = 0)
      val stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long").add("text", "string"))
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$root/landing")
      Dedup.streamingMedallionLshTick(stream, s"$root/silver", s"$root/idx",
        s"$root/pairs", s"$root/ckpt", threshold = 0.5, minChars = 30)

      // SILVER: every delta row lands, quarantined rows carry their reasons
      val silver = spark.read.parquet(s"$root/silver")
      assert(silver.count() === 4L)
      val errs = silver.select(col("doc_id"), col("validation_errors"),
        col("is_valid")).collect()
      assert(errs.count(!_.getBoolean(2)) === 2, "exactly the two dirty rows invalid")
      assert(errs.exists(r => !r.isNullAt(0) && r.getLong(0) == 102L &&
        r.getString(1).contains("SHORT_TEXT")))
      assert(errs.exists(r => r.isNullAt(0) && r.getString(1).contains("NULL:doc_id")))

      // INDEX: only the two valid delta docs were signed
      val indexed = spark.read.parquet(s"$root/idx/shingles")
        .filter(col("batch") >= 1).select(col("doc_id"))
        .distinct().as[Long].collect().toSet
      assert(indexed === Set(101L, 201L), s"only valid docs may index: $indexed")

      // PAIRS ≡ one-shot batch probe over the CLEANED-VALID deltas
      val pairs = spark.read.parquet(s"$root/pairs")
        .select(col("index_id"), col("delta_id"))
        .as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 101L)),
        s"the near-dup of doc 1 is the only pair: $pairs")
    }
  }

  test("streamingMedallionLshTick: a later drain from the same checkpoint processes only new files") {
    withTempDir { root =>
      val base = Seq((1L, "alpha beta gamma delta epsilon zeta eta"))
        .toDF("doc_id", "text")
      Dedup.lshIndexBuild(base, s"$root/idx", batch = 0)
      def drain(): Unit = {
        val stream = spark.readStream
          .schema(new org.apache.spark.sql.types.StructType()
            .add("doc_id", "long").add("text", "string"))
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$root/landing")
        Dedup.streamingMedallionLshTick(stream, s"$root/silver", s"$root/idx",
          s"$root/pairs", s"$root/ckpt", threshold = 0.5, minChars = 10)
      }
      Seq((101L, "beta gamma delta epsilon zeta eta"))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$root/landing")
      drain()
      val afterFirst = spark.read.parquet(s"$root/idx/buckets")
        .select(col("batch")).distinct().count()
      Seq((201L, "gamma delta epsilon zeta eta theta iota"))
        .toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(s"$root/landing")
      drain()
      val batches = spark.read.parquet(s"$root/idx/buckets")
        .select(col("batch")).distinct().as[Int].collect().sorted
      assert(afterFirst === 2L && batches.toSeq === Seq(0, 1, 2),
        s"checkpoint must resume, not reprocess: $batches")
      // both deltas ended up indexed exactly once
      val counts = spark.read.parquet(s"$root/idx/shingles")
        .groupBy(col("doc_id")).count().as[(Long, Long)].collect().toMap
      assert(counts(101L) === 1L && counts(201L) === 1L)
    }
  }

  // ------------------------------------------- MediaCodecs video fingerprint

  /** One 16×12 frame of the q349 generator (pert applies the +4 brightness
    * re-encode plus the frame-2 white corner overlay). */
  private def vidFrame(id: Long, f: Int, pert: Boolean): Array[Byte] =
    MediaCodecs.bmpBytes(16, 12, (x, y) => {
      val r = ((x * x * (3 + id % 7) + y * y * (5 + id % 11)
        + x * y * (1 + id % 13) + 37 * id + 19 * f) % 256).toInt
      val g = ((x * x * (2 + id % 5) + y * y * (7 + id % 3)
        + x * y * (2 + id % 11) + 11 * id + 23 * f) % 256).toInt
      val b = ((x * x * (1 + id % 9) + y * y * (4 + id % 13)
        + x * y * (3 + id % 7) + 23 * id + 29 * f) % 256).toInt
      if (pert && f == 2 && x < 2 && y < 2) (255, 255, 255)
      else if (pert) (math.min(255, r + 4), math.min(255, g + 4),
        math.min(255, b + 4))
      else (r, g, b)
    })

  private def vid(id: Long, nf: Int, pert: Boolean = false): Array[Byte] =
    MediaCodecs.videoBytes((0 until nf).map(f => vidFrame(id, f, pert)))

  test("GVID container: round-trips frames; rejects bad magic and truncation") {
    val frames = (0 until 3).map(f => vidFrame(7L, f, pert = false))
    val bytes = MediaCodecs.videoBytes(frames)
    val back = MediaCodecs.parseVideoFrames(bytes).get
    assert(back.length === 3)
    assert(back.zip(frames).forall { case (a, b) => a.sameElements(b) })
    assert(MediaCodecs.parseVideoFrames("XVID????".getBytes).isEmpty)
    assert(MediaCodecs.parseVideoFrames(bytes.dropRight(5)).isEmpty,
      "a truncated final frame must fail the strict walk, not decode partially")
  }

  test("videoHash64: tail clip leaving the sampled index set intact is invisible") {
    val full = vid(11L, nf = 11)
    val clipped = vid(11L, nf = 9) // drops frames 9,10; sampled set {0,2,4,6} intact
    val h1 = MediaCodecs.videoHash64(full, stride = 2, maxSampled = 4).get
    val h2 = MediaCodecs.videoHash64(clipped, stride = 2, maxSampled = 4).get
    assert(h1 === h2, "head-anchored sampling: unsampled tail frames must not move a bit")
  }

  test("videoHash64: uniform unsaturated brightness shift flips zero bits") {
    // every pixel +4 with no channel at 252+ → every luma +4 exactly, every
    // grid cell +4 exactly, 64·(cell+4) > tot+256 ⟺ 64·cell > tot
    def frame(f: Int, shift: Int) = MediaCodecs.bmpBytes(16, 12, (x, y) => {
      val v = (x * 13 + y * 7 + f * 19) % 200
      (v + shift, (v * 2) % 200 + shift, (v * 3) % 200 + shift)
    })
    val a = MediaCodecs.videoBytes((0 until 8).map(frame(_, 0)))
    val b = MediaCodecs.videoBytes((0 until 8).map(frame(_, 4)))
    assert(MediaCodecs.videoHash64(a).get === MediaCodecs.videoHash64(b).get)
  }

  test("videoHash64 through hammingNearDuplicates recovers every planted video pair") {
    val vids = (0L until 48L).flatMap { id =>
      val nf = (9 + id % 3).toInt
      Seq((id, vid(id, nf))) ++
        (if (id % 4 == 0) Seq((id + 1000L, vid(id, nf, pert = true))) else Nil) ++
        (if (id % 6 == 0)
           Seq((id + 2000L, MediaCodecs.videoBytes(
             (0 until nf - 2).map(f => vidFrame(id, f, pert = false)))))
         else Nil)
    }
    val sigs = vids.map { case (id, bytes) =>
        (id, MediaCodecs.videoHash64(bytes, stride = 2, maxSampled = 4).get)
      }.toDF("media_id", "vfp")
    val pairs = Dedup.hammingNearDuplicates(sigs, "media_id", "vfp",
        maxDistance = 7, bits = 64)
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, d) => ((a, b), d) }.toMap
    val wantPert = (0L until 48L by 4).map(id => (id, id + 1000L))
    val wantClip = (0L until 48L by 6).map(id => (id, id + 2000L))
    assert(wantPert.forall(pairs.contains),
      s"all 12 perturbed copies must land within Hamming 7: ${wantPert.filterNot(pairs.contains)}")
    assert(wantClip.forall(p => pairs.get(p).contains(0L)),
      "tail-clipped copies must be bit-identical (Hamming 0)")
    // every emitted pair shares a source video — no cross-content collisions
    assert(pairs.keys.forall { case (a, b) => a % 1000 === b % 1000 },
      s"unexpected cross-source pair among ${pairs.keys.filterNot { case (a, b) => a % 1000 == b % 1000 }}")
  }
}
