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

  test("applyDeltaToSums: empty changeset is the identity") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "v")
    val gold = base.groupBy("g").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val changes = Cdc.snapshotDiff(base, base, Seq("k"))
    assert(changes.isEmpty)
    val out = Cdc.applyDeltaToSums(gold, changes, "g", "v", "n", "s")
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(out === gold.orderBy("g").as[(String, Long, Long)].collect().toSeq)
  }
}
