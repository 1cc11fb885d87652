package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity join — the entity-resolution /
  * record-linkage primitive (dirty catalog names, OCR'd titles, user-typed
  * identifiers vs a clean dimension).
  *
  * The naive form is an all-pairs nested loop — quadratic, unusable at
  * scale. This is the partition-signature ("PassJoin") scheme: split each
  * right-side string into `maxDist + 1` contiguous blocks; by pigeonhole, if
  * `lev(l, r) <= maxDist` then at least ONE block of `r` survives unedited,
  * so it appears in `l` as an exact substring at a position shifted by at
  * most `maxDist`. Candidates are therefore found with an EQUI-join on
  * (block index, block text, right length) — shuffle-partitionable like any
  * hash join — and only candidates pay the O(len²) Levenshtein verify.
  * (Scheme from the published PassJoin line of work; implemented from the
  * pigeonhole argument, no reference code.)
  *
  * Per left row the signature fan-out is bounded: (2·maxDist + 1) lengths ×
  * (maxDist + 1) blocks × (2·maxDist + 1) shifts — ~75 short substrings at
  * maxDist = 2, independent of data size. Keep `maxDist` small (1–3): the
  * fan-out grows cubically.
  *
  * Right strings SHORTER than `maxDist + 1` have an empty block, voiding the
  * pigeonhole argument (two 2-char strings are within distance 2 with no
  * shared block), so they take a separate length-banded path: such strings
  * come from a bounded space (|alphabet|^maxDist), so the band join stays
  * small at any corpus size.
  *
  * Output: (left id, right id, dist), distinct pairs, dist <= maxDist.
  */
object Fuzzy {

  def editDistanceJoin(left: DataFrame, right: DataFrame,
                       leftId: String, leftStr: String,
                       rightId: String, rightStr: String,
                       maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"editDistanceJoin: maxDist must be in [1, 3], got $maxDist")
    val k = maxDist + 1 // number of blocks

    val lBase = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"))
      .withColumn("__ll", length(col("__ls")))
    val rBase = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"))
      .withColumn("__rl", length(col("__rs")))

    // ---- main path: right strings long enough that every block is non-empty.
    val r = rBase.filter(col("__rl") >= k)
      .withColumn("__b", explode(expr(
        s"""transform(sequence(0, ${k - 1}), i -> named_struct(
           |  'i', i,
           |  'start', i * __rl DIV $k,
           |  'len', (i + 1) * __rl DIV $k - i * __rl DIV $k))""".stripMargin)))
      .select(col("__rid"), col("__rs"), col("__rl"), col("__b.i").as("__ri"),
        expr("substring(__rs, __b.start + 1, __b.len)").as("__sig"))

    // Left side: for every plausible right length L2 (|L2 − len(l)| <=
    // maxDist, L2 >= k), every block index, every start within ±maxDist of
    // the block's home position. Shifts are enumerated unconditionally
    // (fixed ±maxDist band — Spark's sequence() cannot take an empty range)
    // and invalid starts are filtered AFTER, from the recomputed block
    // length.
    val l = lBase
      .withColumn("__c", explode(expr(
        s"""flatten(transform(sequence(greatest(__ll - $maxDist, $k), __ll + $maxDist), L2 ->
           |  flatten(transform(sequence(0, ${k - 1}), i ->
           |    transform(sequence(-$maxDist, $maxDist), s ->
           |      named_struct('L2', L2, 'i', i, 'p', i * L2 DIV $k + s))))))""".stripMargin)))
      .withColumn("__blen",
        expr(s"(__c.i + 1) * __c.L2 DIV $k - __c.i * __c.L2 DIV $k"))
      .filter(col("__c.p") >= 0 && col("__c.p") + col("__blen") <= col("__ll"))
      .select(col("__lid"), col("__ls"),
        col("__c.L2").as("__L2"), col("__c.i").as("__li"),
        expr("substring(__ls, __c.p + 1, __blen)").as("__sub"))

    val mainPairs = l.join(r,
        col("__L2") === col("__rl") && col("__li") === col("__ri")
          && col("__sub") === col("__sig"))
      .select(col("__lid"), col("__rid"), col("__ls"), col("__rs"))

    // ---- short path: right strings with len < k, banded by |len diff| <=
    // maxDist (a necessary condition for lev <= maxDist). The band is
    // expressed as an EQUI-join on the right length — the left explodes its
    // <= 2·maxDist+1 plausible short lengths — so this stays a hash join
    // (a raw |len(l) − len(r)| <= d predicate would plan as a nested-loop).
    val rShort = rBase.filter(col("__rl") < k)
    val shortPairs = lBase.filter(col("__ll") < lit(k + maxDist))
      .withColumn("__L2", explode(expr(
        s"sequence(greatest(__ll - $maxDist, 0), least(__ll + $maxDist, ${k - 1}))")))
      .join(rShort, col("__L2") === col("__rl"))
      .select(col("__lid"), col("__rid"), col("__ls"), col("__rs"))

    mainPairs.union(shortPairs)
      .distinct()
      .withColumn("dist", levenshtein(col("__ls"), col("__rs")))
      .filter(col("dist") <= maxDist)
      .select(col("__lid").as(leftId), col("__rid").as(rightId), col("dist"))
  }

  /** Blocked multi-field record linkage: score candidate pairs by a weighted
    * sum of per-field agreements — the deterministic core of a
    * Fellegi–Sunter matcher (the probabilistic weights become these integer
    * weights once fitted; scoring is the scale-out part, fitting is
    * metadata-sized). Both frames carry the same field column names plus a
    * blocking column; candidates are ONLY pairs sharing a block (an
    * equi-join — never all-pairs), each scored
    * `Σ weight(f) · [l.f <=> r.f]` with null-safe equality (two NULLs agree;
    * NULL vs value does not). Returns `(left_id, right_id, score)` for
    * pairs with `score >= threshold`.
    *
    * Scale: one hash equi-join on the block key + codegen'd projection
    * arithmetic — scan speed per candidate. Block size is the cost dial:
    * candidates ∝ Σ |block_l|·|block_r|, so pick blocks like
    * (postcode, name-initial) that bound the product; a hot block
    * quadratizes and wants the same salting/cap treatment as any skewed
    * join ([[graft.engine.Skew]]). Fuzzy per-field agreement (typo-tolerant
    * names) composes by pre-normalizing fields or pre-matching them with
    * [[editDistanceJoin]]. */
  def linkageScores(left: DataFrame, leftId: String,
                    right: DataFrame, rightId: String,
                    blockCol: String, fields: Seq[(String, Long)],
                    threshold: Long): DataFrame = {
    require(fields.nonEmpty, "linkageScores: no fields to compare")
    require(fields.forall(_._2 > 0), "linkageScores: weights must be positive")
    val l = left.select(col(leftId).as("left_id") +: col(blockCol).as("__blk") +:
      fields.map { case (f, _) => col(f).as(s"__l_$f") }: _*)
    val r = right.select(col(rightId).as("right_id") +: col(blockCol).as("__blk") +:
      fields.map { case (f, _) => col(f).as(s"__r_$f") }: _*)
    val score = fields.map { case (f, w) =>
      when(col(s"__l_$f") <=> col(s"__r_$f"), lit(w)).otherwise(lit(0L))
    }.reduce(_ + _)
    l.join(r, Seq("__blk"))
      .withColumn("score", score)
      .filter(col("score") >= threshold)
      .select(col("left_id"), col("right_id"), col("score"))
  }

  /** Jaro–Winkler similarity column ([[graft.functions.JaroWinkler]] — the
    * codegen'd kernel, DuckDB-contract semantics), rounded to 6 dp per the
    * suite's similarity-score discipline. */
  def jaroWinkler(a: Column, b: Column): Column =
    round(org.apache.spark.sql.graft.Bridge.column(
      graft.functions.JaroWinkler(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b))), 6)

  /** Best Jaro–Winkler match per query string under equi-join BLOCKING —
    * the classic linkage pattern (block, score candidates, keep the argmax):
    * candidates exist only within a block key (never all-pairs — the
    * blocking key bounds per-block density exactly like [[editDistanceJoin]]'s
    * signature join and Spatial's grid cells), each candidate pays one
    * O(len·window) kernel call, and the per-query argmax is a window
    * partitioned BY QUERY (never global). Ties break by similarity DESC then
    * candidate id.
    *
    * Output: `(query id, match id, jw)` — one row per query that had ≥ 1
    * candidate in its block. */
  def jwBestMatch(queries: DataFrame, queryId: String, queryText: Column,
                  queryBlock: Column,
                  corpus: DataFrame, corpusId: String, corpusText: Column,
                  corpusBlock: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(queryId).as("query_id"),
      queryText.as("__qt"), queryBlock.as("__blk"))
    val c = corpus.select(col(corpusId).as("match_id"),
      corpusText.as("__ct"), corpusBlock.as("__blk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("jw").desc, col("match_id"))
    q.join(c, Seq("__blk"))
      .withColumn("jw", jaroWinkler(col("__qt"), col("__ct")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("match_id"), col("jw"))
  }

  /** Fellegi–Sunter (1969, public literature) per-field match weights, with
    * the u-probability ESTIMATED from the data: u_f = P(two random records
    * agree on f) = Σ_v c_v² / N², in clamped permille (1..999 — a constant
    * or all-distinct field would send the log weights to ±∞). The
    * m-probability (P(agree | true match)) is the caller's per-field prior
    * in permille. Log weights follow the suite's ROUND(ln·1e6) integer
    * contract:  w_agree = round(10⁶·ln(m/u)),
    *            w_disagree = round(10⁶·ln((1000−m)/(1000−u))).
    *
    * Output one row per field:
    * `(field, m_permille, u_permille, w_agree_micros, w_disagree_micros)`.
    *
    * Scale: per field one groupBy to the value alphabet then a one-row
    * reduce — the union is field-count-sized. Overflow note: Σc² ≤ N², so
    * the permille numerator N²·1000 caps int64 at N ≈ 3·10⁹ records;
    * past that, lift to DECIMAL per the spearman discipline. */
  def fsFieldWeights(records: DataFrame, fields: Seq[(String, Long)]): DataFrame = {
    require(fields.nonEmpty, "fsFieldWeights: no fields")
    require(fields.forall { case (_, m) => m >= 1 && m <= 999 },
      "fsFieldWeights: m_permille must be in [1, 999]")
    fields.map { case (f, m) =>
      records.groupBy(col(f)).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("sq"), sum(col("c")).as("n"))
        .select(lit(f).as("field"), lit(m).as("m_permille"),
          expr("GREATEST(LEAST(sq * 1000 DIV (n * n), 999L), 1L)").as("u_permille"))
    }.reduce(_ unionByName _)
      .select(col("field"), col("m_permille"), col("u_permille"),
        expr("CAST(ROUND(1e6 * ln((m_permille * 1e0) / u_permille)) AS BIGINT)")
          .as("w_agree_micros"),
        expr("CAST(ROUND(1e6 * ln(((1000 - m_permille) * 1e0) / (1000 - u_permille))) AS BIGINT)")
          .as("w_disagree_micros"))
  }

  /** Fellegi–Sunter pair scoring under equi-join blocking: every in-block
    * pair scores Σ_f (agree on f ? w_agree_f : w_disagree_f) in integer
    * micros. `weights` is [[fsFieldWeights]]' output — field-alphabet-sized,
    * so collecting it to build ONE codegen'd integer expression is the
    * metadata license, and the join itself is the [[linkageScores]] blocked
    * shape (never all-pairs).
    *
    * Output: `(left_id, right_id, score_micros)` for every in-block pair —
    * callers band/threshold downstream. */
  def fsScores(left: DataFrame, leftId: String,
               right: DataFrame, rightId: String,
               blockCol: String, weights: DataFrame,
               fields: Seq[String]): DataFrame = {
    require(fields.nonEmpty, "fsScores: no fields")
    val w = weights.collect().map(r => r.getAs[String]("field") ->
      (r.getAs[Long]("w_agree_micros"), r.getAs[Long]("w_disagree_micros"))).toMap
    require(fields.forall(w.contains), s"fsScores: weights missing for ${fields.filterNot(w.contains)}")
    val l = left.select(col(leftId).as("left_id") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__l_$f")): _*)
    val r = right.select(col(rightId).as("right_id") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__r_$f")): _*)
    val score = fields.map { f =>
      when(col(s"__l_$f") <=> col(s"__r_$f"), lit(w(f)._1)).otherwise(lit(w(f)._2))
    }.reduce(_ + _)
    l.join(r, Seq("__blk"))
      .select(col("left_id"), col("right_id"), score.as("score_micros"))
  }

  /** Sorted-neighborhood candidate generation (Hernández & Stolfo 1995 —
    * public literature): sort all records by a key, compare only records
    * within ordinal distance ≤ `w`. The blocking-key complement — equi-join
    * blocks miss matches whose block value was perturbed; a sort key keeps
    * lexical near-matches ADJACENT regardless.
    *
    * Distributed without a global window or sort-merge self-join:
    * 1. global ordinal = range-exchange on `(sortKey, idCol)` frozen to
    *    scratch + per-partition counts → driver offsets (metadata) +
    *    partition-local row_number — the [[graft.ext.Rank.globalMinTieRanks]]
    *    machinery;
    * 2. rows at distance ≤ w share bucket `ord DIV w` or sit in adjacent
    *    buckets, so each row PROBES buckets {b, b+1} (a 2× explode) and the
    *    candidate join is EQUI on the bucket id — per-bucket density is
    *    exactly w, so the join emits ≤ 2w rows per record, never all-pairs.
    * Each unordered pair appears exactly once (o_b > o_a and the probe-side
    * duplication covers exactly one of b/b+1 per pair).
    *
    * Output: `(id_a, id_b, k_a, k_b)` with ordinal(a) < ordinal(b).
    * `scratchDir` must outlive consumption of the returned lazy frame. */
  def sortedNeighborhoodPairs(records: DataFrame, idCol: String,
                              sortKey: String, w: Int, scratchDir: String,
                              numPartitions: Int = 32): DataFrame = {
    require(w >= 1, s"sortedNeighborhoodPairs: w must be >= 1, got $w")
    import org.apache.spark.sql.expressions.Window
    val spark = records.sparkSession
    records.select(col(sortKey), col(idCol))
      .repartitionByRange(numPartitions, col(sortKey), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(s"$scratchDir/sn")
    val parts = spark.read.parquet(s"$scratchDir/sn")
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetsDf = spark.createDataFrame(offsets.toList).toDF("__pid", "__off")
    val win = Window.partitionBy(col("__pid")).orderBy(col(sortKey), col(idCol))
    val ordinals = parts
      .withColumn("__lrn", row_number().over(win))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .select(col(idCol), col(sortKey), (col("__off") + col("__lrn")).as("__ord"))
      .withColumn("__b", expr(s"__ord DIV $w"))
    val probe = ordinals.select(col(idCol).as("id_a"), col(sortKey).as("k_a"),
      col("__ord").as("__oa"), explode(array(col("__b"), col("__b") + 1)).as("__b"))
    probe.join(ordinals.select(col(idCol).as("id_b"), col(sortKey).as("k_b"),
        col("__ord").as("__ob"), col("__b")), Seq("__b"))
      .filter(col("__ob") > col("__oa") && col("__ob") - col("__oa") <= w)
      .select(col("id_a"), col("id_b"), col("k_a"), col("k_b"))
  }
}
