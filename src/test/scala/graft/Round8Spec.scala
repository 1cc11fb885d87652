package graft

import graft.engine.Incremental
import org.apache.spark.sql.functions._

/** Round-8 additions: the versioned store's atomic commit manifest and the
  * vacuum safety contract around it. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("uncommitted version dirs (crash before manifest) are invisible to readers") {
    withTempDir { root =>
      val state = s"$root/state"
      Incremental.commitVersion(Seq((1L, "a")).toDF("k", "s"), state, 0L)
      // Simulate a writer that crashed between the snapshot write and its
      // commit: data files land, no manifest follows.
      Seq((1L, "PARTIAL")).toDF("k", "s").write.parquet(s"$state/v=1")
      assert(Incremental.committedVersions(spark, state) === Seq(0L))
      assert(Incremental.latestUpsertState(spark, state).get
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((1L, "a")))
      // The retry (same batch id) overwrites the partial dir and commits;
      // only then does v=1 become the latest.
      Incremental.commitVersion(Seq((1L, "a2")).toDF("k", "s"), state, 1L)
      assert(Incremental.committedVersions(spark, state) === Seq(0L, 1L))
      assert(Incremental.latestUpsertState(spark, state).get
        .collect().map(r => r.getString(1)).toSeq === Seq("a2"))
    }
  }

  test("readers use the manifest's file list — unlisted files in a committed dir are ignored") {
    withTempDir { root =>
      val state = s"$root/state"
      Incremental.commitVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), state, 0L)
      // A concurrent/stale writer drops an extra parquet file into the dir.
      Seq((99L, "JUNK")).toDF("k", "s").write.parquet(s"$root/junk")
      val junk = new java.io.File(s"$root/junk").listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.copy(junk.toPath,
        java.nio.file.Paths.get(s"$state/v=0/part-junk-unlisted.snappy.parquet"))
      val got = Incremental.latestUpsertState(spark, state).get
        .collect().map(_.getLong(0)).toSet
      assert(got === Set(1L, 2L), "unlisted file must not be read")
    }
  }

  test("vacuumVersions refuses keep < 2 (the predecessor is the streaming recovery point)") {
    withTempDir { root =>
      val state = s"$root/state"
      Incremental.commitVersion(Seq((1L, "a")).toDF("k", "s"), state, 0L)
      val e = intercept[IllegalArgumentException] {
        Incremental.vacuumVersions(spark, state, keep = 1)
      }
      assert(e.getMessage.contains("keep must be >= 2"))
    }
  }

  test("goldenRecordsByColumn: each column elects its own winner; all-null and singleton groups behave") {
    // group 1: seg newest non-null is id=2's (ts 9); longest name is id=1's;
    //          id=3 has the newest ts but a NULL seg — non-null must win.
    // group 2: all segs null → NULL survives. id=9: singleton, no label row.
    val records = Seq(
      (1L, Option("old-seg"), Option("a much longer name"), 5L),
      (2L, Option("new-seg"), Option("short"), 9L),
      (3L, Option.empty[String], Option("mid name x"), 99L),
      (7L, Option.empty[String], Option("n7"), 1L),
      (8L, Option.empty[String], Option.empty[String], 2L),
      (9L, Option("solo-seg"), Option("solo"), 3L)
    ).toDF("id", "seg", "name", "ts")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 2L), (8L, 2L))
      .toDF("id", "component")
    val out = graft.ext.Dedup.goldenRecordsByColumn(records, labels, "id", Seq(
        ("seg", "seg", col("ts")),
        ("name", "name", length(col("name"))),
        ("max_ts", "ts", col("ts"))))
      .orderBy("component")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)), r.getLong(4))).toSeq
    assert(out === Seq(
      (1L, 3L, Some("new-seg"), Some("a much longer name"), 99L),
      (2L, 2L, None, Some("n7"), 2L),
      (9L, 1L, Some("solo-seg"), Some("solo"), 3L)))
  }

  test("applyDeltaWithExtremes: deleted maximum forces a group-pruned rebuild equal to recompute") {
    import graft.engine.Cdc
    def goldOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val base = Seq(
      ("a", 1L, 1L), ("a", 2L, 5L), ("a", 3L, 9L),   // delete the 9: max shrinks
      ("b", 4L, 10L), ("b", 5L, 20L),                // insert 30: max grows, no rebuild
      ("c", 6L, 7L),                                 // untouched
      ("d", 7L, 2L), ("d", 8L, 2L)                   // delete ONE of twin minima
    ).toDF("g", "k", "v")
    val newDf = Seq(
      ("a", 1L, 1L), ("a", 2L, 5L),
      ("b", 4L, 10L), ("b", 5L, 20L), ("b", 9L, 30L),
      ("c", 6L, 7L),
      ("d", 8L, 2L),
      ("e", 10L, 42L)                                // brand-new group
    ).toDF("g", "k", "v")
    val changes = Cdc.snapshotDiff(base.select(col("k"), col("g"), col("v")),
      newDf.select(col("k"), col("g"), col("v")), Seq("k"))
    val out = Cdc.applyDeltaWithExtremes(goldOf(base), changes, newDf,
        "g", "v", "n", "s", "mn", "mx")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    val expect = goldOf(newDf)
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === expect)
    assert(out.find(_._1 == "a").get._5 === 5L, "rebuilt max must be the runner-up")
    assert(out.find(_._1 == "d").get._4 === 2L, "twin-min survivor keeps the extreme")
  }

  test("applyDeltaWithExtremes: cross-group move debits one extreme set and credits the other") {
    import graft.engine.Cdc
    def goldOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
    val base = Seq(("a", 1L, 9L), ("a", 2L, 5L), ("b", 3L, 1L)).toDF("g", "k", "v")
    // the max of `a` MOVES to `b`, where it becomes the new max
    val newDf = Seq(("b", 1L, 9L), ("a", 2L, 5L), ("b", 3L, 1L)).toDF("g", "k", "v")
    val changes = Cdc.snapshotDiff(base.select(col("k"), col("g"), col("v")),
      newDf.select(col("k"), col("g"), col("v")), Seq("k"))
    val out = Cdc.applyDeltaWithExtremes(goldOf(base), changes, newDf,
        "g", "v", "n", "s", "mn", "mx")
      .orderBy("g").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out === goldOf(newDf).orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq)
  }

  test("compact collapses scattered files into byte-targeted bins without touching content") {
    withTempDir { root =>
      val df = (1L to 20000L).map(i => (i, s"row-$i-payload")).toDF("id", "payload")
      df.repartition(50).write.parquet(s"$root/scattered")
      def parts(d: String) = new java.io.File(d).listFiles()
        .count(_.getName.startsWith("part-"))
      assert(parts(s"$root/scattered") === 50)
      val n = graft.engine.Layout.compact(spark, s"$root/scattered",
        s"$root/compact", targetFileBytes = 10L * 1024 * 1024)
      assert(n === 1, "20k rows fit one 10MB-target file")
      assert(parts(s"$root/compact") === 1)
      val got = spark.read.parquet(s"$root/compact")
        .orderBy("id").as[(Long, String)].collect().toSeq
      assert(got === (1L to 20000L).map(i => (i, s"row-$i-payload")))
      // source untouched (crash-safe: swap is the caller's rename)
      assert(parts(s"$root/scattered") === 50)
    }
  }

  test("tombstones: uncommitted batches invisible, overlap idempotent, append-only enforced") {
    withTempDir { root =>
      import graft.engine.Tombstones
      val data = s"$root/data"
      val tomb = s"$root/tomb"
      (1L to 100L).map(i => (i, s"p$i")).toDF("k", "payload").write.parquet(data)
      // No tombstones: the live view IS the base scan.
      assert(Tombstones.readMergeOnRead(spark, data, tomb, Seq("k")).count() === 100)
      Tombstones.append(Seq(1L, 2L, 3L).toDF("k"), tomb, 0L)
      // Overlapping re-delete of 2 and 3 plus new 4: counted once each.
      Tombstones.append(Seq(2L, 3L, 4L).toDF("k"), tomb, 1L)
      val live = Tombstones.readMergeOnRead(spark, data, tomb, Seq("k"))
      assert(live.count() === 96)
      assert(live.agg(min(col("k"))).head.getLong(0) === 5L)
      // Crashed writer: batch dir without _SUCCESS must stay invisible.
      Seq(99L).toDF("k").write.parquet(s"$tomb/d=2")
      new java.io.File(s"$tomb/d=2/_SUCCESS").delete()
      assert(Tombstones.committedBatches(spark, tomb) === Seq(0L, 1L))
      assert(Tombstones.readMergeOnRead(spark, data, tomb, Seq("k")).count() === 96)
      // Append-only: reusing a committed batch id is refused.
      intercept[IllegalArgumentException] {
        Tombstones.append(Seq(5L).toDF("k"), tomb, 0L)
      }
      // compactApply folds the log into a rewritten copy equal to the live view.
      val n = Tombstones.compactApply(spark, data, tomb, s"$root/compact",
        targetFileBytes = 10L * 1024 * 1024)
      assert(n === 1)
      assert(spark.read.parquet(s"$root/compact").orderBy("k")
        .select("k").as[Long].collect().toSeq === (5L to 100L))
    }
  }

  test("percentile sketch: per-group tables merge to the whole-table answer, ranks exact") {
    import graft.engine.Profile
    val df = (0L until 1000L).map(i => (if (i % 2 == 0) "a" else "b", i)).toDF("g", "v")
    val perGroup = Profile.percentileSketchTable(df, Seq("g"), "v", bucketWidth = 10L)
    // Merging the two per-group sketches must equal the sketch built in one go.
    val mergedCounts = perGroup.groupBy("bucket").agg(sum("n").as("n"))
    val whole = Profile.percentileSketchTable(
      df.withColumn("g", lit("all")), Seq("g"), "v", bucketWidth = 10L)
      .select("bucket", "n")
    assert(mergedCounts.orderBy("bucket").collect().toSeq ===
      whole.orderBy("bucket").collect().toSeq)
    // 0..999 at width 10: p50 target=500 → bucket 49; p99 target=990 → bucket 98.
    val p = Profile.percentilesFromSketch(perGroup, Seq(50, 99), bucketWidth = 10L)
      .orderBy("pct").as[(Int, Long, Long)].collect().toSeq
    assert(p === Seq((50, 49L, 490L), (99, 98L, 980L)))
  }

  test("weighted sample: deterministic under repartition, k rows, bad weights fail loudly") {
    import graft.ext.Sampling
    val df = (1L to 400L).map(i => (i, 1L + i % 4)).toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, col("id"), col("w"), k = 50)
        .select("id").as[Long].collect().toSeq
    val a = ids(df.repartition(1))
    val b = ids(df.repartition(13, col("w")))
    assert(a === b, "the selected set is a pure function of the data")
    assert(a.size === 50)
    // Higher weight ⇒ more races: the weight-4 tier should outnumber the
    // weight-1 tier in any non-degenerate draw of 50 from a uniform id pool.
    val byTier = df.filter(col("id").isin(a: _*)).groupBy("w").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byTier.getOrElse(4L, 0L) > byTier.getOrElse(1L, 0L))
    intercept[Exception] { // weight 0: sequence(1, 0, step=1) throws
      ids(df.withColumn("w", when(col("id") === 7L, 0L).otherwise(col("w"))))
    }
  }

  test("count-min: group sketches merge to the whole-table sketch; estimates never undercount") {
    import graft.ext.CountMin
    val df = (1L to 300L).map(i => (if (i % 3 == 0) "a" else "b", i % 20)).toDF("g", "item")
    val perGroup = CountMin.sketchTable(df, Seq("g"), col("item"))
    val mergedCells = perGroup.groupBy("d", "bucket").agg(sum("n").as("n"))
    val whole = CountMin.sketchTable(df.withColumn("g", lit("all")), Seq("g"), col("item"))
      .select("d", "bucket", "n")
    assert(mergedCells.orderBy("d", "bucket").collect().toSeq ===
      whole.orderBy("d", "bucket").collect().toSeq)
    val est = CountMin.estimate(perGroup, (0L to 20L).toDF("item"), "item")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 20L).foreach { i =>
      assert(est(i) >= exact.getOrElse(i, 0L), s"CM must never undercount item $i")
    }
    assert(est(20L) >= 0L && !exact.contains(20L)) // absent item: cells may collide, never negative
  }

  test("weighted prefix threshold: exact first-crossing ranks across partition boundaries") {
    import graft.ext.Rank
    // Zipf-ish: item i has weight 101-i, i = 1..100; total = 5050.
    val df = (1L to 100L).map(i => (i, 101L - i)).toDF("item", "w")
      .withColumn("neg_w", -col("w"))
    val got = Rank.weightedPrefixThreshold(df, Seq("neg_w", "item"), "w",
        tot => Seq("half" -> (tot + 1) / 2, "all" -> tot, "over" -> (tot + 1)),
        numPartitions = 7)
      .collect().map(r => r.getString(0) -> (Option(r.get(1)), Option(r.get(2)), r.getLong(3))).toMap
    // Sorted desc: 100, 99, ... running sums 100, 199, ...; first >= 2525
    // is the reference answer computed directly here.
    val weightsDesc = (1L to 100L).map(101L - _).sorted.reverse
    val runs = weightsDesc.scanLeft(0L)(_ + _).tail
    val kHalf = runs.indexWhere(_ >= 2525L) + 1
    assert(got("half") === ((Some(kHalf.toLong), Some(runs(kHalf - 1)), 5050L)))
    assert(got("all") === ((Some(100L), Some(5050L), 5050L)))
    assert(got("over") === ((None, None, 5050L)), "target beyond total yields NULLs")
  }

  test("scd2Delete closes only current versions, leaves history, ignores unknown keys") {
    import graft.engine.Merge
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00"), false), // history
      (1L, "a2", ts("2024-06-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true),
      (2L, "b", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true)
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val deletes = Seq((1L, ts("2024-09-01 00:00:00")), (99L, ts("2024-09-01 00:00:00")))
      .toDF("k", "del_ts")
    val out = Merge.scd2Delete(dim, deletes, "k", "del_ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "a", Some("2024-06-01 00:00:00.0"), false),   // history untouched
      (1L, "a2", Some("2024-09-01 00:00:00.0"), false),  // current closed at del_ts
      (2L, "b", None, true)))                            // undeleted key stays current
  }

  test("slidingChunks overlap by width-stride and cover every token") {
    import graft.ext.Dedup
    val df = Seq("a b c d e f g", "x").toDF("text")
      .select(Dedup.slidingChunks(col("text"), width = 4, stride = 2).as("chunks"))
    val got = df.as[Seq[String]].collect().toSeq
    // 7 tokens, starts 0/2/4/6: last two windows clamp at the tail.
    assert(got(0) === Seq("a b c d", "c d e f", "e f g", "g"))
    assert(got(1) === Seq("x"), "short doc is a single chunk")
  }

  test("changeFeed nets inserts/deletes/updates across versions and refuses vacuumed endpoints") {
    withTempDir { root =>
      val state = s"$root/state"
      Incremental.commitVersion(
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s"), state, 0L)
      Incremental.commitVersion(            // drop 3, add 4, rewrite 2
        Seq((1L, "a"), (2L, "B1"), (4L, "d")).toDF("k", "s"), state, 1L)
      Incremental.commitVersion(            // rewrite 2 back to its v0 value
        Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "s"), state, 2L)
      val feed = Incremental.changeFeed(spark, state, Seq("k"), 0L, 2L)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // 2's rewrite TELESCOPES away (v2 value == v0 value): net feed is 3-del, 4-ins
      assert(feed === Map(3L -> "delete", 4L -> "insert"))
      val e = intercept[IllegalArgumentException] {
        Incremental.changeFeed(spark, state, Seq("k"), 0L, 5L)
      }
      assert(e.getMessage.contains("must both be committed"))
    }
  }

  test("saltedJoin equals the plain inner join, including keys missing from the small side") {
    val big = Seq(
      ("hot", 1L, 10L), ("hot", 2L, 20L), ("hot", 3L, 30L), ("hot", 4L, 40L),
      ("cold", 5L, 50L),
      ("orphan", 6L, 60L) // key absent from small: dropped by both forms
    ).toDF("k", "id", "v")
    val small = Seq(("hot", "H"), ("cold", "C"), ("unused", "U")).toDF("k", "label")
    val salted = graft.engine.Skew.saltedJoin(big, small, Seq("k"),
        discriminator = col("id"), salt = 4)
      .orderBy("id").as[(String, Long, Long, String)].collect().toSeq
    val plain = big.join(small, Seq("k"))
      .orderBy("id").as[(String, Long, Long, String)].collect().toSeq
    assert(salted === plain)
    assert(salted.map(_._2) === Seq(1L, 2L, 3L, 4L, 5L), "orphan key must drop")
  }

  test("histogram works on column names that need backticks") {
    val df = Seq(0L, 1L, 7L, 15L).toDF("weird name-col")
    val out = graft.engine.Profile.histogram(df, "weird name-col", nBuckets = 2)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 3L, 0L, 7L), (1L, 1L, 15L, 15L)))
  }

  test("groupAwareSplit: every group lands whole in exactly one split; bad bounds fail loudly") {
    val df = (1L to 400L).map(i => (i, s"src${i % 40}")).toDF("id", "source")
    val out = graft.ext.Sampling.groupAwareSplit(df, col("source"),
      Seq("train" -> 800L, "val" -> 900L, "test" -> 1000L))
    // Leakage-proof by construction: no source may appear under two splits.
    val straddlers = out.groupBy("source")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1).count()
    assert(straddlers === 0L)
    // Assignment is a pure row function: repartitioning must not change it.
    val again = graft.ext.Sampling.groupAwareSplit(df.repartition(7), col("source"),
      Seq("train" -> 800L, "val" -> 900L, "test" -> 1000L))
    assert(out.orderBy("id").collect().toSeq === again.orderBy("id").collect().toSeq)
    // All rows get a split (fences end at 1000 ⇒ no null branch survives).
    assert(out.filter(col("split").isNull).count() === 0L)
    intercept[IllegalArgumentException] {
      graft.ext.Sampling.groupAwareSplit(df, col("source"), Seq("train" -> 900L))
    }
    intercept[IllegalArgumentException] {
      graft.ext.Sampling.groupAwareSplit(df, col("source"),
        Seq("a" -> 900L, "b" -> 800L, "c" -> 1000L))
    }
  }

  test("majorityVote: majority wins, ties break to smallest label, totals count all votes") {
    val votes = Seq(
      (1L, "B"), (1L, "B"), (1L, "A"),            // clear majority B
      (2L, "C"), (2L, "A"), (2L, "C"), (2L, "A"), // 2-2 tie -> A (smallest)
      (3L, "Z")                                   // singleton -> unanimous Z
    ).toDF("item", "label")
    val out = graft.ext.Labels.majorityVote(votes, col("item"), col("label"))
      .orderBy("item").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq((1L, "B", 2L, 3L), (2L, "A", 2L, 4L), (3L, "Z", 1L, 1L)))
  }

  test("dedupWithinWindow: earliest row per key per window survives; boundaries are exact") {
    val us = 1000000L // 1s windows in micros
    val rows = Seq(
      // key k1, window 0: two rows -> earliest (ts=100) survives
      (1L, "k1", 100L), (2L, "k1", 900000L),
      // ts exactly at the boundary opens the NEXT window (DIV semantics)
      (3L, "k1", us),
      // same ts, different id -> tie broken by smaller id
      (4L, "k2", 500L), (5L, "k2", 500L)
    ).toDF("event_id", "k", "ts_us")
    val kept = graft.ext.Dedup.dedupWithinWindow(rows, Seq("k"), col("ts_us"),
        tieCol = "event_id", windowMicros = us)
      .orderBy("time_bucket", "k")
      .select("time_bucket", "n_collapsed", "event_id", "k")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(kept === Seq((0L, 2L, 1L, "k1"), (0L, 2L, 4L, "k2"), (1L, 1L, 3L, "k1")))
    assert(kept.map(_._2).sum === rows.count())
  }

  test("bm25TopDocs: tf ordering at equal length, absent-term docs excluded, repartition-stable") {
    val docs = Seq(
      (1L, "a a a b"), (2L, "a b c d"), (3L, "x y z w")
    ).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis.bm25TopDocs(docs, Seq("a"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(out.map(_._1) === Seq(1L, 2L), "only docs containing the term, higher tf first")
    assert(out(0)._2 > out(1)._2)
    val again = graft.ext.TextAnalysis.bm25TopDocs(docs.repartition(5), Seq("a"), k = 10)
      .as[(Long, Long)].collect().toSeq
    assert(out === again, "micro-unit scores must be partition-invariant")
  }

  test("pageRankIterations: hand-computed star-graph fixpoint in integer micro-units") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = graft.ext.Graph.pageRankIterations(edges, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // iter1: hub gets 150000 + 850*3e6 DIV 1000 = 2700000; leaves get
    // 150000 + 850*(1e6 DIV 3) DIV 1000 = 433333. iter2: hub 150000 +
    // 850*(3*433333) DIV 1000 = 1254999; leaves 150000 + 850*(2700000 DIV 3)
    // DIV 1000 = 915000.
    assert(out === Seq((1L, 1254999L), (2L, 915000L), (3L, 915000L), (4L, 915000L)))
  }

  test("prefixDuplicates: strict prefixes and exact copies flagged, partition seams exact") {
    val docs = Seq(
      (1L, "abc"), (2L, "abcd"), (3L, "abx"), (4L, "zz"), (5L, "zz")
    ).toDF("doc_id", "text")
    def run(np: Int) = graft.ext.Dedup.prefixDuplicates(docs, numPartitions = np) {
      flagged =>
        flagged.orderBy("doc_id")
          .select("doc_id", "succ_starts_with", "succ_equal")
          .as[(Long, Boolean, Boolean)].collect().toSeq
    }
    val expect = Seq((1L, true, false), (2L, false, false), (3L, false, false),
      (4L, true, true), (5L, false, false))
    assert(run(3) === expect, "seam between range partitions must still see the successor")
    assert(run(1) === expect)
  }

  test("editDistanceJoin: blocked candidates equal the naive quadratic join, incl. short strings") {
    val left = Seq((1L, "kitten"), (2L, "sitting"), (3L, "ab"), (4L, ""), (5L, "saturday"))
      .toDF("lid", "ls")
    val right = Seq((10L, "mitten"), (11L, "sittin"), (12L, "xy"), (13L, "a"),
      (14L, "sunday"), (15L, "kitten")).toDF("rid", "rs")
    val blocked = graft.ext.Fuzzy.editDistanceJoin(left, right, "lid", "ls", "rid", "rs", 2)
      .orderBy("lid", "rid").as[(Long, Long, Int)].collect().toSeq
    val naive = left.crossJoin(right)
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= 2).select("lid", "rid", "dist")
      .orderBy("lid", "rid").as[(Long, Long, Int)].collect().toSeq
    assert(blocked === naive)
    assert(naive.nonEmpty, "test data must actually produce matches")
    assert(naive.contains((3L, 12L, 2)), "short-string path must catch ab~xy")
    assert(naive.contains((4L, 13L, 1)), "empty-string edge must survive")
  }

  test("kHopDistances: exact hop labels on a path graph; revisits excluded") {
    // 1 -> 2 -> 3 -> 4 -> 5 plus a back-edge 3 -> 1 (must not relabel node 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.ext.Graph.kHopDistances(edges, seeds, hops = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("orphanCount: null fks and unmatched fks are orphans; checked counts all rows") {
    val child = Seq(Some(1L), Some(2L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = graft.engine.Expectations.orphanCount(child, "fk", parent, "pk", "t")
      .as[(Long, Long)].collect().head
    assert(out === ((4L, 2L)), "null fk and fk=9 are the two orphans")
  }

  test("vacuum counts only committed versions and garbage-collects crashed dirs below horizon") {
    withTempDir { root =>
      val state = s"$root/state"
      (0L to 3L).foreach(v =>
        Incremental.commitVersion(Seq((v, s"v$v")).toDF("k", "s"), state, v))
      // Make v=1 look crashed (data written, commit never happened).
      val manifest = new java.io.File(s"$state/v=1/${Incremental.CommitManifest}")
      assert(manifest.exists())
      assert(manifest.delete())
      val deleted = Incremental.vacuumVersions(spark, state, keep = 2)
      // committed = 0,2,3; horizon = 2 ⇒ committed 0 and uncommitted 1 go
      assert(deleted === Seq(0L, 1L))
      assert(Incremental.committedVersions(spark, state) === Seq(2L, 3L))
      assert(Incremental.latestUpsertStateBefore(spark, state, 2L).isEmpty,
        "below-horizon time travel must fail empty, not read stale dirs")
    }
  }

  test("madOutliers: hand-checked median/MAD and partition-count invariance") {
    // values: 10,12,14,16,100 → lower median 14; |dev| = 4,2,0,2,86 →
    // sorted 0,2,2,4,86, lower median (MAD) = 2; k=3 ⇒ threshold 6 ⇒ only
    // the 86 deviation (id 5, value 100) is an outlier.
    val df = Seq((1L, 10L), (2L, 12L), (3L, 14L), (4L, 16L), (5L, 100L))
      .toDF("id", "v")
    for (parts <- Seq(1, 7)) {
      val got = graft.ext.Rank.madOutliers(df.repartition(parts), "id", "v",
        k = 3L, numPartitions = 4).head()
      assert(got.getAs[Long]("n") === 5L)
      assert(got.getAs[Long]("median") === 14L)
      assert(got.getAs[Long]("mad") === 2L)
      assert(got.getAs[Long]("n_outliers") === 1L)
      assert(got.getAs[Long]("outlier_id_checksum") === 5L)
    }
  }

  test("madOutliers: constant column has MAD 0 — every deviation flags at > 0") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L)).toDF("id", "v")
    val got = graft.ext.Rank.madOutliers(df, "id", "v", k = 3L).head()
    assert(got.getAs[Long]("median") === 7L)
    assert(got.getAs[Long]("mad") === 0L)
    // threshold 3·0 = 0: the single 9 (deviation 2 > 0) is the outlier.
    assert(got.getAs[Long]("n_outliers") === 1L)
    assert(got.getAs[Long]("outlier_id_checksum") === 4L)
  }

  test("imputeGroupMedian: lower median fills NULLs; all-null group stays NULL") {
    val df = Seq[(String, java.lang.Long, Long)](
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L), ("a", 40L, 4L),
      ("a", null, 5L),
      ("b", null, 6L), ("b", null, 7L))
      .toDF("g", "v", "id")
    val got = graft.engine.Profile.imputeGroupMedian(df, "g", "v", "id")
      .select(col("id"), col("imputed_flag"), col("value_filled"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    // even count → LOWER median = 20 (rank (4+1) DIV 2 = 2)
    assert(got(5L) === (true, Some(20L)))
    assert(got(1L) === (false, Some(10L)))
    // group with no non-null values: flag false, value stays NULL
    assert(got(6L) === (false, None))
    assert(got(7L) === (false, None))
  }

  test("gapFillForwardFill: densifies the span, LOCF fills, leading value present") {
    // key a observed at t=2 (v 10) and t=5 (v 40): grid 2,3,4,5 with
    // 3 and 4 carried forward from 10.
    val df = Seq(("a", 2L, 10L), ("a", 5L, 40L), ("b", 7L, 70L))
      .toDF("k", "t", "v")
    val got = graft.ext.TimeSeries.gapFillForwardFill(df, "k", "t", "v")
      .select(col("k"), col("t"), col("value_filled"), col("was_gap"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(got === Map(
      ("a", 2L) -> (10L, false), ("a", 3L) -> (10L, true),
      ("a", 4L) -> (10L, true), ("a", 5L) -> (40L, false),
      ("b", 7L) -> (70L, false)))
  }

  test("ewmaPerKey: hand-checked fold, order columns respected, single point = itself") {
    // decay 850: seed 1000000, then 500000 → (850*1000000+150*500000)/1000
    // = 925000; then 200000 → (850*925000+150*200000)/1000 = 816250.
    val df = Seq(("u", 1L, 1000000L), ("u", 3L, 200000L), ("u", 2L, 500000L),
      ("w", 9L, 42L)).toDF("k", "ts", "v")
    val got = graft.ext.TimeSeries.ewmaPerKey(df, "k", Seq("ts"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("u") === (3L, 816250L))
    assert(got("w") === (1L, 42L))
  }

  test("lastTouchAttribution: most recent preceding touch wins; no touch = default") {
    import org.apache.spark.sql.functions.col
    // u1: view(1) click(2) buy(3) buy(4) → both buys credit 'click'
    // u2: buy(1) view(2) buy(3) → first buy 'direct', second 'view'
    val df = Seq(
      ("u1", 1L, "view"), ("u1", 2L, "click"), ("u1", 3L, "buy"), ("u1", 4L, "buy"),
      ("u2", 1L, "buy"), ("u2", 2L, "view"), ("u2", 3L, "buy"))
      .toDF("u", "ts", "et")
    val got = graft.ext.Sessionize.lastTouchAttribution(df, col("u"), col("et"),
        col("ts"), Seq(col("ts")), Seq("view", "click"), "buy")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(got === Map(("u1", 3L) -> "click", ("u1", 4L) -> "click",
      ("u2", 1L) -> "direct", ("u2", 3L) -> "view"))
  }

  test("transitionCounts: consecutive pairs per user, last event emits none") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("u1", 1L, "a"), ("u1", 2L, "b"), ("u1", 3L, "a"),
      ("u2", 1L, "a"), ("u2", 2L, "b")).toDF("u", "ts", "et")
    val got = graft.ext.Sessionize.transitionCounts(df, col("u"), col("et"),
        Seq(col("ts")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("tokenDrift: cross-multiplied drift is exact; absent tokens count 0") {
    // A: "x x y" (tot 3), B: "x z" (tot 2).
    //   x: |2*2 - 1*3| = 1;  y: |1*2 - 0*3| = 2;  z: |0*2 - 1*3| = 3
    val a = Seq("x x y").toDF("text")
    val b = Seq("x z").toDF("text")
    val got = graft.ext.TextAnalysis.tokenDrift(a, b, "text", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("z", 0L, 1L, 3L), ("y", 1L, 0L, 2L), ("x", 2L, 1L, 1L)))
    // k smaller than vocab truncates after the tie-broken ordering.
    val top1 = graft.ext.TextAnalysis.tokenDrift(a, b, "text", k = 1).collect()
    assert(top1.map(_.getString(0)).toSeq === Seq("z"))
  }

  test("joinCardinalities equals the executed joins, incl. null keys and empty sides") {
    import org.apache.spark.sql.functions.col
    // Many-to-many, null keys on both sides, keys unique to each side.
    val l = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None).toDF("k")
    val r = Seq(Some(1L), Some(1L), Some(1L), Some(3L), Some(9L), None, None).toDF("j")
    val got = graft.engine.Joins.joinCardinalities(l, "k", r, "j").head()
    val exp = Seq("inner", "left_outer", "right_outer", "full_outer")
      .map(t => l.join(r, l("k") === r("j"), t).count())
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((exp(0), exp(1), exp(2), exp(3))))
    // Empty right side: inner = 0, left_outer = |L|.
    val empty = Seq.empty[Option[Long]].toDF("j")
    val g2 = graft.engine.Joins.joinCardinalities(l, "k", empty, "j").head()
    assert((g2.getLong(0), g2.getLong(1), g2.getLong(2), g2.getLong(3))
      === ((0L, 5L, 0L, 5L)))
  }

  test("streamingDedup: batch-2 replays drop via keyed state, new keys survive") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.engine.Scratch.withTempDir("graft-sdedup-spec-") { root =>
      val in = new java.io.File(root, "in"); in.mkdirs()
      // Batch 1: keys 1,2 (2 a dup within the batch). Batch 2: full replay + key 3.
      val b1 = Seq((1L, 10L), (2L, 20L), (2L, 20L)).toDF("k", "ts_s")
      val b2 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "ts_s")
      b1.coalesce(1).write.parquet(s"$root/stage1")
      b2.coalesce(1).write.parquet(s"$root/stage2")
      def move(stage: String, name: String): Unit = {
        val part = new java.io.File(s"$root/$stage").listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(in.getPath, name)): Unit
      }
      move("stage1", "a.parquet"); move("stage2", "b.parquet")
      val stream = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1).parquet(in.getPath)
        .withColumn("__ts", expr("timestamp_seconds(ts_s)"))
      val out = graft.engine.Incremental.streamingDedup(
        stream, Seq("k"), "__ts", "1000 days")
      val sink = "sdedup_spec"
      spark.catalog.dropTempView(sink)
      val q = out.writeStream.outputMode("append").format("memory").queryName(sink)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // File order a<b is the source's discovery order: 3 batches of state later,
      // only the first arrival of each key remains.
      val got = spark.table(sink).select(col("k")).collect().map(_.getLong(0)).sorted
      assert(got.toSeq === Seq(1L, 2L, 3L))
    }
  }

  test("shingleNovelty: verbatim copy fully seen, fresh doc fully novel, overlap partial") {
    // Reference: one doc "a b c d e" → shingles {abc, bcd, cde}.
    val ref = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val cand = Seq(
      (1L, "a b c d e"),   // exact copy: 3/3 seen
      (2L, "x y z w"),     // disjoint: 0/2 seen
      (3L, "a b c x y")    // shares only "a b c": 1/3 seen
    ).toDF("doc_id", "text")
    val got = graft.ext.Dedup.shingleNovelty(cand, ref)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((3L, 3L)), 2L -> ((2L, 0L)), 3L -> ((3L, 1L))))
  }

  test("erasure: audit counts match purge's complement; null FKs kept; empty table arm") {
    import org.apache.spark.sql.functions.col
    val subjects = Seq(1L, 2L).toDF("uid")
    val orders = Seq(Some(1L), Some(1L), Some(3L), None).toDF("fk")
    val empty = Seq.empty[Option[Long]].toDF("fk")
    val purged = graft.engine.Erasure.purge(orders, "fk", subjects, "uid")
    // Null FK references no subject — it must survive the purge.
    assert(purged.collect().map(r => Option(r.get(0))).toSet
      === Set(Some(3L), None: Option[Any]))
    val audit = graft.engine.Erasure.audit(subjects, "uid",
        Seq(("orders", orders, "fk"), ("none", empty, "fk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit === Map("orders" -> ((2L, 2L)), "none" -> ((0L, 0L))))
    assert(audit("orders")._2 === purged.count())
  }

  test("writeAuditPublish: failed audit stays invisible; fixed retry of the same version publishes") {
    import org.apache.spark.sql.functions.col
    import graft.engine.{Expectations, Incremental}
    graft.engine.Scratch.withTempDir("graft-wap-spec-") { root =>
      val rules = Seq(Expectations.Rule("positive", col("v") > 0L))
      val bad = Seq(("a", 1L), ("b", -5L)).toDF("k", "v")
      val (pub1, rep1) = Incremental.writeAuditPublish(bad, rules, root, 1L)
      assert(!pub1)
      assert(rep1.head().getLong(2) === 1L) // one violating row
      // Staged-but-unpublished version is invisible to every reader.
      assert(Incremental.committedVersions(spark, root).isEmpty)
      assert(Incremental.latestUpsertState(spark, root).isEmpty)
      // The fixed retry OVERWRITES the same version slot and publishes.
      val good = Seq(("a", 1L), ("b", 5L)).toDF("k", "v")
      val (pub2, _) = Incremental.writeAuditPublish(good, rules, root, 1L)
      assert(pub2)
      assert(Incremental.committedVersions(spark, root) === Seq(1L))
      val state = Incremental.latestUpsertState(spark, root).get
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(state === Map("a" -> 1L, "b" -> 5L))
    }
  }

  test("histogramDrift: shared edges, one-sided buckets, exact cross-multiplied drift") {
    // Joint range [0, 9], 2 buckets of width 5: bucket 0 = 0..4, bucket 1 = 5..9.
    // A = {0, 1, 9} (2 low, 1 high; totA=3), B = {5, 6} (0 low, 2 high; totB=2).
    //   bucket 0: |2*2 - 0*3| = 4;  bucket 1: |1*2 - 2*3| = 4
    val a = Seq(0L, 1L, 9L).toDF("v")
    val b = Seq(5L, 6L).toDF("v")
    val got = graft.engine.Profile.histogramDrift(a, b, "v", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(0L -> ((2L, 0L, 4L)), 1L -> ((1L, 2L, 4L))))
  }

  test("linkageScores: null-safe agreement, block exclusion, threshold") {
    val l = Seq(
      (1L, "b1", Some("ann"), Some("a@x")),   // full match with r10
      (2L, "b1", None, Some("b@x")),          // name NULL<=>NULL agrees with r20
      (3L, "b2", Some("cat"), Some("c@x"))    // same fields as r30 but other block
    ).toDF("id", "blk", "name", "email")
    val r = Seq(
      (10L, "b1", Some("ann"), Some("a@x")),
      (20L, "b1", None, Some("z@z")),         // email disagrees: score 4 < 6
      (30L, "b3", Some("cat"), Some("c@x"))
    ).toDF("id", "blk", "name", "email")
    val got = graft.ext.Fuzzy.linkageScores(l, "id", r, "id", "blk",
        Seq(("name", 4L), ("email", 3L)), threshold = 6L)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(got.toSeq === Seq((1L, 10L, 7L)))
    // Lowering the threshold admits the NULL<=>NULL name agreement (score 4).
    val loose = graft.ext.Fuzzy.linkageScores(l, "id", r, "id", "blk",
        Seq(("name", 4L), ("email", 3L)), threshold = 4L)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(loose === Set((1L, 10L, 7L), (2L, 20L, 4L)))
  }

  test("labelPropagation: majority wins, ties take smallest label, labels freeze") {
    import org.apache.spark.sql.functions.col
    // Node 10 has labeled neighbors 1(label 0), 2(label 2), 3(label 2) →
    // majority label 2. Node 20 has neighbors 1(0) and 2(2) → tie → label 0.
    // Node 30 only reaches labels via node 10 in round 2 — and node 10 is
    // frozen at its round-1 label.
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L), (2L, 20L),
      (10L, 30L)).toDF("src", "dst")
    val und = edges.union(edges.select(col("dst"), col("src")))
    val seeds = Seq((1L, 0L), (2L, 2L), (3L, 2L)).toDF("node", "label")
    val got = graft.ext.Graph.labelPropagation(und, seeds, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> ((0L, 0L)), 2L -> ((2L, 0L)), 3L -> ((2L, 0L)),
      10L -> ((2L, 1L)), 20L -> ((0L, 1L)), 30L -> ((2L, 2L))))
    // iters = 0 returns the seeds untouched.
    val none = graft.ext.Graph.labelPropagation(und, seeds, iters = 0).count()
    assert(none === 3L)
  }
}
