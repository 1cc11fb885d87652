package graft

import org.apache.spark.sql.functions._

import graft.engine.{Cdc, Gold, Profile}
import graft.ext.{Sampling, Similarity, TextAnalysis}

/** Specs for the round-8 operators: weighted mixture upsampling, semantic
  * dedup, melt/unpivot, top-n-gram vocabulary, winsorized stats, and
  * incremental aggregate maintenance. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- Sampling.mixtureUpsample --------------------------------------------

  test("mixtureUpsample: integer weights give exact copy counts with 0-based epochs") {
    val df = (1L to 50L).map(i => (i, if (i <= 25) "a" else "b")).toDF("id", "g")
    val out = Sampling.mixtureUpsample(df, col("g"), col("id"),
      Map("a" -> 3000000L, "b" -> 0L), defaultPerMillion = 0L).collect()
    // weight 3.0 → exactly 3 copies of every 'a' row, epochs 0,1,2; 'b' dropped.
    assert(out.length === 75)
    assert(out.forall(_.getString(1) == "a"))
    val epochs = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sorted.toSeq)
    assert(epochs.values.forall(_ == Seq(0L, 1L, 2L)))
  }

  test("mixtureUpsample: fractional weight is deterministic and ~rate in expectation") {
    val df = (1L to 2000L).map(i => (i, "a")).toDF("id", "g")
    val run1 = Sampling.mixtureUpsample(df, col("g"), col("id"),
      Map("a" -> 500000L), defaultPerMillion = 0L)
    val n1 = run1.count()
    val n2 = Sampling.mixtureUpsample(df.repartition(13), col("g"), col("id"),
      Map("a" -> 500000L), defaultPerMillion = 0L).count()
    assert(n1 === n2) // pure function of the row, not of partitioning
    assert(n1 > 800 && n1 < 1200) // ~0.5 of 2000
    assert(run1.select(max("epoch")).as[Long].head === 0L)
  }

  test("mixtureUpsample: weight 1.5 gives every row once plus ~half twice") {
    val df = (1L to 1000L).map(i => (i, "a")).toDF("id", "g")
    val out = Sampling.mixtureUpsample(df, col("g"), col("id"),
      Map("a" -> 1500000L), defaultPerMillion = 0L)
    val perId = out.groupBy("id").count()
    assert(perId.filter(col("count") < 1).count() === 0) // full copy guaranteed
    val twice = perId.filter(col("count") === 2).count()
    assert(twice > 350 && twice < 650)
  }

  // --- Similarity.semanticDedup --------------------------------------------

  test("semanticDedup: removes planted shifted copies, keeps lowest id, is stable") {
    val base = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("vec_id", "embedding")
    // plant near-identical copies (tiny uniform shift) at id+1000
    val planted = base.select((col("vec_id") + 1000).as("vec_id"),
      transform(col("embedding"), x => x + 0.001).as("embedding"))
    val corpus = base.unionByName(planted)
    val kept = Similarity.semanticDedup(corpus, threshold = 0.999, bits = 4)
      .select("vec_id").as[Long].collect().toSet
    // every survivor pair (i, i+1000) must keep only the lower id — no copy
    // may survive together with its original (same bucket: shift preserves signs
    // for almost all planes; allow LSH recall < 1 but require most caught)
    val survivedCopies = kept.count(_ >= 1000)
    assert(survivedCopies <= 8, s"too many planted copies survived: $survivedCopies")
    assert((0 until 40).forall(i => kept.contains(i.toLong))) // originals always kept
  }

  // --- TextAnalysis.ngrams / topNgrams -------------------------------------

  test("ngrams: n=3 yields size-n windows in order; short docs yield none") {
    val df = Seq("a b c d", "x y").toDF("text")
    val out = df.select(TextAnalysis.ngrams(col("text"), 3).as("g")).collect()
    assert(out(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](0) === Seq.empty)
  }

  test("topNgrams: counts, ordering, and tie-break are deterministic") {
    val docs = Seq("p q r p q r", "p q r s", "z z z z").toDF("text")
    // trigrams: "p q r"×3 ("p q r p","q r p",... let's count precisely below)
    val out = TextAnalysis.topNgrams(docs, col("text"), n = 3, k = 3)
      .as[(String, Long)].collect()
    // doc1: "p q r","q r p","r p q","p q r" → p q r ×2; doc2: "p q r","q r s";
    // doc3: "z z z"×2. Top: (p q r, 3), (z z z, 2), then alphabetic ties at 1.
    assert(out(0) === ("p q r", 3L))
    assert(out(1) === ("z z z", 2L))
    assert(out(2)._2 === 1L)
    assert(out(2)._1 === Seq("q r p", "q r s", "r p q").min) // ngram-asc tie-break
  }

  // --- Gold.meltWide --------------------------------------------------------

  test("meltWide: inverse of a known-values pivot round-trips") {
    val long = Seq(("k1", "a", 1L), ("k1", "b", 2L), ("k2", "a", 3L), ("k2", "b", 0L))
      .toDF("k", "cat", "v")
    val wide = long.groupBy("k")
      .agg(sum(when(col("cat") === "a", col("v")).otherwise(0L)).as("a"),
        sum(when(col("cat") === "b", col("v")).otherwise(0L)).as("b"))
    val melted = Gold.meltWide(wide, Seq("k"), Seq("a", "b"), "cat", "v")
    assert(melted.columns.toSeq === Seq("k", "cat", "v"))
    assert(melted.orderBy("k", "cat").as[(String, String, Long)].collect().toSeq ===
      Seq(("k1", "a", 1L), ("k1", "b", 2L), ("k2", "a", 3L), ("k2", "b", 0L)))
  }

  // --- Profile.winsorizedSums ----------------------------------------------

  test("winsorizedSums: clamps exactly at the integer-ceil rank bounds") {
    // 100 rows 1..100 in one group: lo idx = ceil(1*100/100)=1 → lo=1,
    // hi idx = ceil(99*100/100)=99 → hi=99; sum = (1..100 clamped) = sum(1..99)+99
    val df = (1L to 100L).map(i => ("g", i, i)).toDF("grp", "v", "id")
    val r = Profile.winsorizedSums(df, "grp", "v", "id").head()
    assert(r.getLong(1) === 100L) // n_rows
    assert(r.getLong(2) === 1L) // lo_val
    assert(r.getLong(3) === 99L) // hi_val
    assert(r.getLong(4) === (1L to 99L).sum + 99L)
  }

  test("winsorizedSums: outliers are pulled to the band, small groups survive") {
    // 10 rows: ceil(1*10/100)=1 → lo = min; ceil(99*10/100)=10 → hi = max
    // (tiny groups clamp nothing — the operator degrades gracefully).
    val tiny = (1L to 10L).map(i => ("t", i * 10, i)).toDF("grp", "v", "id")
    val rt = Profile.winsorizedSums(tiny, "grp", "v", "id").head()
    assert(rt.getLong(4) === (1L to 10L).map(_ * 10).sum)
    // 200 rows with two monster outliers: both land above the P99 bound.
    val vals = (1L to 198L) ++ Seq(1000000L, 2000000L)
    val big = vals.zipWithIndex.map { case (v, i) => ("b", v, i.toLong) }.toDF("grp", "v", "id")
    val rb = Profile.winsorizedSums(big, "grp", "v", "id").head()
    assert(rb.getLong(3) < 1000000L) // hi bound excludes the outliers
    assert(rb.getLong(4) < vals.sum) // clamped sum strictly below raw sum
  }

  // --- functions.Int8Quantize ----------------------------------------------

  test("Int8Quantize: max-abs scaling, half-away rounding, zero vector, SQL name") {
    val df = Seq(
      (1L, Seq(1.0, -2.0, 4.0)), // mx=4: 31.75→32, -63.5→-64, 127
      (2L, Seq(0.0, 0.0)), // zero vector → zero codes, no NaN
      (3L, Seq(-5.0)) // single negative → -127
    ).toDF("id", "v")
    val out = df.select(col("id"),
        graft.functions.VectorFunctions.int8Quantize(col("v")).as("c"))
      .orderBy("id").as[(Long, Seq[Int])].collect()
    assert(out(0)._2 === Seq(32, -64, 127))
    assert(out(1)._2 === Seq(0, 0))
    assert(out(2)._2 === Seq(-127))
    // interpreted path (eval without codegen) agrees
    val interp = df.filter(col("id") === 1)
      .select(graft.functions.VectorFunctions.int8Quantize(col("v")).as("c"))
      .head().getSeq[Int](0)
    assert(interp === Seq(32, -64, 127))
    // SQL-callable via the registry
    org.apache.spark.sql.graft.Bridge.installGraftFunctions(spark)
    val viaSql = spark.sql(
      "SELECT graft_int8_quantize(array(1.0d, -2.0d, 4.0d)) AS c")
      .head().getSeq[Int](0)
    assert(viaSql === Seq(32, -64, 127))
  }

  // --- Cdc.applyDeltaToSums ------------------------------------------------

  test("applyDeltaToSums: equals full recompute incl. group moves, births, deaths") {
    val base = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L), (5L, "c", 50L)
    ).toDF("k", "g", "v")
    val next = Seq(
      (1L, "a", 15L), // value update
      (2L, "b", 20L), // group move a→b
      (3L, "b", 30L), // unchanged
      // 4 deleted; 5 deleted → group c dies
      (6L, "d", 60L) // insert → group d born
    ).toDF("k", "g", "v")
    val gold = base.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val changes = Cdc.snapshotDiff(base, next, Seq("k"))
    val maintained = Cdc.applyDeltaToSums(gold, changes, "g", "v", "n", "s")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val recomputed = next.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(maintained === recomputed)
    assert(!maintained.exists(_._1 == "c")) // emptied group dropped
    assert(maintained.exists(_._1 == "d")) // new group created
  }

  // --- Profile.histogram / rankBins ----------------------------------------

  test("histogram: integer edges cover the range, counts add up, nulls excluded") {
    val df = ((1L to 100L).map(Option(_)) :+ Option.empty[Long]).toDF("v")
    val out = Profile.histogram(df, "v", nBuckets = 4)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    // span = 100, width 25: buckets [1,25] [26,50] [51,75] [76,100]
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).sum === 100L) // the null row is excluded
    assert(out.map(r => (r._3, r._4)).toSeq ===
      Seq((1L, 25L), (26L, 50L), (51L, 75L), (76L, 100L)))
  }

  test("histogram: negative-spanning range keeps integer edges exact") {
    val df = (-50L to 49L).toDF("v")
    val out = Profile.histogram(df, "v", nBuckets = 4)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.forall(_._2 == 25L))
    assert(out.head._3 === -50L && out.last._4 === 49L)
  }

  test("rankBins: more bins than rows still yields one distinct bin per row") {
    val df = (1L to 3L).map(i => (i, "g", i * 7)).toDF("id", "g", "v")
    val bins = Profile.rankBins(df, "g", "v", "id", nBins = 10)
      .select("bin").as[Long].collect().sorted.toSeq
    assert(bins === Seq(1L, 2L, 3L))
  }

  test("mixtureUpsample: arbitrary weights give per-id copies of floor(w) or floor(w)+1") {
    // sweep a few representative weights; for each, every id's copy count
    // must be exactly floor or floor+1 of the weight, and epochs contiguous
    val df = (1L to 300L).map(i => (i, "g")).toDF("id", "g")
    for (wPpm <- Seq(100000L, 999999L, 1000001L, 1750000L, 3250000L)) {
      val out = Sampling.mixtureUpsample(df, col("g"), col("id"), Map("g" -> wPpm), 0L)
        .groupBy("id").agg(count(lit(1)).as("c"), max("epoch").as("me"))
        .as[(Long, Long, Long)].collect()
      val base = wPpm / 1000000L
      out.foreach { case (id, c, me) =>
        assert(c == base || c == base + 1, s"w=$wPpm id=$id copies=$c")
        assert(me === c - 1, s"w=$wPpm id=$id epochs not contiguous") // 0..c-1
      }
      val total = out.map(_._2).sum
      val expected = 300.0 * wPpm / 1000000.0
      assert(math.abs(total - expected) <= 300 * 0.35 + 1,
        s"w=$wPpm total=$total expected≈$expected")
    }
  }

  test("mixtureUpsample: unlisted group falls back to the default weight") {
    val df = (1L to 500L).map(i => (i, "other")).toDF("id", "g")
    val n = Sampling.mixtureUpsample(df, col("g"), col("id"),
      Map("a" -> 0L), defaultPerMillion = 2000000L).count()
    assert(n === 1000L) // exactly 2 epochs of every row
  }

  test("histogram: constant column lands in one bucket") {
    val df = Seq.fill(7)(42L).toDF("v")
    val out = Profile.histogram(df, "v", nBuckets = 16).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L)
    assert(out.head.getLong(1) === 7L)
  }

  test("rankBins: per-stratum deciles are balanced and deterministic") {
    val df = (1L to 100L).map(i => (i, "a", i * 3 % 97)).toDF("id", "g", "v")
    val out = Profile.rankBins(df, "g", "v", "id", nBins = 10)
    val sizes = out.groupBy("bin").count().orderBy("bin").as[(Long, Long)].collect()
    assert(sizes.map(_._1).toSeq === (1L to 10L)) // NTILE is 1-based
    assert(sizes.forall(_._2 == 10L)) // 100 rows, 10 even bins
    // bin boundaries respect the value order: every bin-1 value < every bin-10 value
    val b1max = out.filter(col("bin") === 1).agg(max("v")).as[Long].head()
    val b10min = out.filter(col("bin") === 10).agg(min("v")).as[Long].head()
    assert(b1max < b10min)
  }

  // --- Sessionize.funnelCounts ---------------------------------------------

  test("funnelCounts: strict ordering — later-stage events before the prior stage don't count") {
    // u1: click@10, view@20, purchase@30 → all three stages.
    // u2: view@5, click@10, view@8 → view BEFORE first click only: stage 2 not reached.
    // u3: click@10, purchase@5 → purchase before click: stage 3 not reached, no view anyway.
    val ev = Seq(
      (1L, "click", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
      (2L, "view", 5L), (2L, "click", 10L), (2L, "view", 8L),
      (3L, "click", 10L), (3L, "purchase", 5L)
    ).toDF("user_id", "event_type", "us")
    val out = graft.ext.Sessionize.funnelCounts(ev, col("user_id"), col("us"),
      col("event_type"), Seq("click", "view", "purchase"))
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((0L, "click", 3L), (1L, "view", 1L), (2L, "purchase", 1L)))
  }

  test("conversionLags: lag from first from-stage to first ordered to-stage, converters only") {
    // u1 converts (click@10 → first view after = 25, not the pre-click view@5);
    // u2 never views after clicking; u3 has no click.
    val ev = Seq(
      (1L, "view", 5L), (1L, "click", 10L), (1L, "view", 25L), (1L, "view", 30L),
      (2L, "click", 10L), (2L, "view", 3L),
      (3L, "view", 7L)
    ).toDF("user_id", "event_type", "us")
    val out = graft.ext.Sessionize.conversionLags(ev, col("user_id"), col("us"),
      col("event_type"), "click", "view").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 15L)))
  }

  test("funnelCounts: unreached stages still report a zero row") {
    val ev = Seq((1L, "click", 10L)).toDF("user_id", "event_type", "us")
    val out = graft.ext.Sessionize.funnelCounts(ev, col("user_id"), col("us"),
      col("event_type"), Seq("click", "view", "purchase"))
      .orderBy("stage_idx").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq((0L, "click", 1L), (1L, "view", 0L), (2L, "purchase", 0L)))
  }

  test("applyDeltaToSums: empty changeset is the identity") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
    val gold = base.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val changes = Cdc.snapshotDiff(base, base, Seq("k"))
    assert(changes.isEmpty)
    val out = Cdc.applyDeltaToSums(gold, changes, "g", "v", "n", "s")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(out === gold.orderBy("g").as[(String, Long, Long)].collect().toSeq)
  }

  // --- Graph.triangleStats -------------------------------------------------

  test("triangleStats: counts each triangle once, canonicalizes duplicates/reversals") {
    // triangle 1-2-3, pendant 3-4, chain 5-6-7; (2,1) duplicates (1,2) reversed
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    val r = graft.ext.Graph.triangleStats(edges).head()
    assert(r.getLong(0) === 6L) // n_edges after canonical dedup
    assert(r.getLong(1) === 4L) // wedges: (1,2,3) (1,3,4) (2,3,4) (5,6,7)
    assert(r.getLong(2) === 1L) // only 1-2-3 closes
  }

  test("triangleStats: hub-degree cap drops the hub and bounds the wedge count") {
    // Star with hub 50 (degree 100) placed mid-range so it is a wedge MIDDLE
    // (x < 50 < z), plus an untouched low-degree triangle 200-201-202.
    val star = (1L to 49L).map(i => (i, 50L)) ++ (51L to 100L).map(j => (50L, j))
    val tri = Seq((200L, 201L), (201L, 202L), (200L, 202L))
    val edges = (star ++ tri).toDF("id_a", "id_b")
    val uncapped = graft.ext.Graph.triangleStats(edges).head()
    assert(uncapped.getLong(0) === 102L)
    assert(uncapped.getLong(1) === 49L * 50L + 1L, "star quadratizes the wedge join")
    assert(uncapped.getLong(2) === 1L)
    // cap below the hub's degree: hub and all its edges go, triangle survives
    val capped = graft.ext.Graph.triangleStats(edges, maxDegree = Some(10L)).head()
    assert(capped.getLong(0) === 3L)
    assert(capped.getLong(1) === 1L)
    assert(capped.getLong(2) === 1L)
    // cap at exactly the max degree: nothing dropped, counts unchanged (q94's mode)
    val atMax = graft.ext.Graph.triangleStats(edges, maxDegree = Some(100L)).head()
    assert(atMax.getLong(0) === 102L && atMax.getLong(1) === 49L * 50L + 1L
      && atMax.getLong(2) === 1L)
  }

  // --- Dedup.goldenRecords -------------------------------------------------

  test("goldenRecords: argmax winner per group, singletons kept, payload carried") {
    val records = Seq(
      (1L, "short", 5L), (2L, "the longest text", 16L), (3L, "mid text", 8L),
      (9L, "loner", 5L)
    ).toDF("doc_id", "text", "len")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "component")
    val out = graft.ext.Dedup.goldenRecords(records, labels, "doc_id", col("len"))
      .orderBy("component")
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    // group 1: winner is doc 2 (longest); loner 9 is its own singleton
    assert(out === Seq(
      (1L, 3L, 2L, "the longest text", 16L),
      (9L, 1L, 9L, "loner", 5L)))
  }

  test("goldenRecords: priority ties break to the HIGHEST id deterministically") {
    val records = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("doc_id", "len")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "component")
    val out = graft.ext.Dedup.goldenRecords(records, labels, "doc_id", col("len"))
      .as[(Long, Long, Long, Long)].head()
    assert(out === ((1L, 3L, 3L, 7L)))
  }

  // --- Profile.sufficientStats ---------------------------------------------

  test("sufficientStats: six sums reproduce Pearson r exactly on a known set") {
    // perfectly correlated pairs (x, 2x): r must be exactly 1
    val df = (1L to 10L).map(i => ("g", i, 2 * i)).toDF("grp", "x", "y")
    val r = Profile.sufficientStats(df, "grp", "x", "y").head()
    val (n, sx, sy, sxx, syy, sxy) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    assert((n, sx, sy) === (10L, 55L, 110L))
    assert(sxx === (1L to 10L).map(i => i * i).sum)
    assert(sxy === 2 * sxx && syy === 4 * sxx)
    val num = (n * sxy - sx * sy).toDouble
    val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(num / den === 1.0)
  }

  // --- Merge.upsertEvolving ------------------------------------------------

  test("upsertEvolving: new column null-backfilled, missing column kept from base") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "s", "v")
    val upd = Seq((2L, 25L, "gold"), (3L, 30L, "silver")).toDF("k", "v", "tier")
    val out = graft.engine.Merge.upsertEvolving(base, upd, Seq("k"))
      .orderBy("k").collect()
    assert(out.map(_.getAs[String]("merge_action")).toSeq === Seq("keep", "update", "insert"))
    // row 1 untouched, tier null; row 2 updated v, keeps base s, gains tier;
    // row 3 inserted with null s
    assert(out.map(r => (r.getAs[Long]("k"), r.getAs[String]("s"),
      r.getAs[Long]("v"), r.getAs[String]("tier"))).toSeq ===
      Seq((1L, "a", 10L, null), (2L, "b", 25L, "gold"), (3L, null, 30L, "silver")))
  }

  test("upsertEvolving: identical schemas degrade to plain upsert") {
    val base = Seq((1L, 10L)).toDF("k", "v")
    val upd = Seq((1L, 11L)).toDF("k", "v")
    val out = graft.engine.Merge.upsertEvolving(base, upd, Seq("k")).collect()
    assert(out.length === 1 && out.head.getAs[Long]("v") === 11L)
  }

  // --- Layout.zorderByN ----------------------------------------------------

  test("zorderKeyN: n=2 is bit-identical to the original 2-dim interleave") {
    import org.apache.spark.sql.graft.Bridge
    val df = Seq((0.0, 0.0), (3.0, 7.0), (5.5, 2.2), (10.0, 10.0)).toDF("x", "y")
    val two = df.select(graft.engine.Layout.zorderKey(
      col("x"), col("y"), 0.0, 10.0, 0.0, 10.0).as("k")).as[Long].collect().toSeq
    val n = df.select(Bridge.column(graft.engine.Layout.zorderKeyNExpr(
      Seq(Bridge.expression(col("x")), Bridge.expression(col("y"))),
      Seq((0.0, 10.0), (0.0, 10.0)), graft.engine.Layout.ZorderBits)).as("k"))
      .as[Long].collect().toSeq
    assert(two === n)
  }

  test("zorderByN: 3-dim clustering shrinks every dimension's mean partition span") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(4096)((rnd.nextInt(1024), rnd.nextInt(1024), rnd.nextInt(1024)))
      .toDF("a", "b", "c")
    val parts = graft.engine.Layout.zorderByN(df, Seq("a", "b", "c"), numFiles = 64)
      .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
        (max("c") - min("c")).as("sc"))
      .as[(Int, Int, Int, Int)].collect()
    assert(parts.length === 64)
    // Random (unclustered) layout: every partition spans ~the full 1023 range
    // in every dimension. The curve must cut MEAN spans well below that;
    // later-listed columns carry higher key significance and cluster tighter
    // (measured means ≈ 461/338/284 at this seed), so the bounds step down.
    def mean(f: ((Int, Int, Int, Int)) => Int) = parts.map(f).sum.toDouble / parts.length
    assert(mean(_._2) <= 650, s"dim a mean span ${mean(_._2)} — no clustering")
    assert(mean(_._3) <= 550, s"dim b mean span ${mean(_._3)} — no clustering")
    assert(mean(_._4) <= 450, s"dim c mean span ${mean(_._4)} — no clustering")
  }

  // --- Incremental.vacuumVersions ------------------------------------------

  test("vacuumVersions: keeps newest K, deletes the rest, latest still readable") {
    import graft.engine.Incremental
    withTempDir { root =>
      val state = s"$root/state"
      (0L to 3L).foreach { v =>
        Incremental.commitVersion(Seq((v, s"v$v")).toDF("k", "s"), state, v)
      }
      val deleted = Incremental.vacuumVersions(spark, state, keep = 2)
      assert(deleted === Seq(0L, 1L))
      val left = new java.io.File(state).listFiles().map(_.getName).toSet
      assert(left.filter(_.startsWith("v=")) === Set("v=2", "v=3"))
      assert(Incremental.latestUpsertState(spark, state).get
        .as[(Long, String)].head() === ((3L, "v3")))
      // below-horizon time travel fails loudly (missing version)
      assert(Incremental.latestUpsertStateBefore(spark, state, 2L).isEmpty)
      // vacuum with keep >= current count is a no-op
      assert(Incremental.vacuumVersions(spark, state, keep = 5) === Seq.empty)
    }
  }

  // --- Incremental.streamingAggMaintenance ---------------------------------

  test("streamingAggMaintenance: streamed CDC batches maintain gold ≡ recompute, exactly once") {
    import org.apache.spark.sql.types._
    import graft.engine.Incremental
    withTempDir { root =>
      val in = s"$root/changes"; val gold = s"$root/gold"; val ckpt = s"$root/ckpt"
      val snap0 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)).toDF("k", "g", "v")
      val snap1 = Seq((1L, "a", 15L), (2L, "b", 20L), (3L, "b", 30L), (4L, "c", 40L))
        .toDF("k", "g", "v") // update, group move, insert
      val snap2 = Seq((1L, "a", 15L), (2L, "b", 25L), (4L, "c", 41L))
        .toDF("k", "g", "v") // delete 3, two value updates
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("change_type", StringType),
        StructField("old_g", StringType), StructField("old_v", LongType),
        StructField("new_g", StringType), StructField("new_v", LongType)))
      def drain(): Unit = Incremental.streamingAggMaintenance(spark,
        spark.readStream.schema(schema).parquet(in),
        groupCol = "g", valueCol = "v", nCol = "n", sumCol = "s",
        goldDir = gold, checkpointDir = ckpt)

      // seed gold below the first stream batch id (batch ids start at 0):
      // the one-time full build lands at v=-1
      Incremental.commitVersion(
        snap0.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s")), gold, -1L)

      Cdc.snapshotDiff(snap0, snap1, Seq("k")).coalesce(1)
        .write.mode("append").parquet(in)
      drain()
      val g1 = Incremental.latestUpsertState(spark, gold).get
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
      assert(g1 === snap1.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("g").as[(String, Long, Long)].collect().toSeq)

      // re-drain with no new files: no new version, state unchanged
      val versions = new java.io.File(gold).listFiles().count(_.getName.startsWith("v="))
      drain()
      assert(new java.io.File(gold).listFiles().count(_.getName.startsWith("v=")) === versions)

      Cdc.snapshotDiff(snap1, snap2, Seq("k")).coalesce(1)
        .write.mode("append").parquet(in)
      drain()
      val g2 = Incremental.latestUpsertState(spark, gold).get
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
      assert(g2 === snap2.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
        .orderBy("g").as[(String, Long, Long)].collect().toSeq)
    }
  }
}
