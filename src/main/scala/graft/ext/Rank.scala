package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact distributed order statistics — value-at-rank selection with NO
  * global sort and NO single-partition window anywhere in the plan.
  *
  * The naive exact-percentile query (`row_number() OVER (ORDER BY ...)`,
  * empty PARTITION BY) funnels the whole table through one reducer — the
  * classic last single-reducer plan in an otherwise distributed suite. The
  * standard distributed replacement, implemented here:
  *
  *   1. range-repartition the rows on the order key (a shuffle that
  *      PARTITIONS by range but never sorts within partitions);
  *   2. materialize once to scratch parquet, freezing the sampled range
  *      boundaries — re-executing a range exchange can re-sample different
  *      boundaries across actions, which would break the offset arithmetic;
  *   3. per-partition row counts, collected to the driver as partition
  *      METADATA (one row per partition — cluster-sized, not data-sized,
  *      the same license as the IVF/PQ centroid collects) → cumulative
  *      offsets;
  *   4. global rank r lives in the unique partition whose [offset+1,
  *      offset+count] interval contains r — only THOSE partitions are
  *      re-read (parquet min/max on the partition-id column prunes the
  *      rest) and locally ranked with a `Window.partitionBy(pid)` — every
  *      sort in the plan is partition-local;
  *   5. filter local rank = r − offset; a handful of rows survive.
  *
  * Scale: two data-parallel shuffles (range exchange, per-pid window over
  * only the hit partitions), O(numPartitions) driver state. At 100 TB the
  * input should already be the selection table (e.g. per-user lags), and
  * `numPartitions` sized so a partition fits an executor; the sort in step 4
  * then touches ~1/numPartitions of the data per requested rank.
  * `percentile_approx` (q57) remains the sketch alternative when 1e-3 rank
  * error is acceptable; this is the EXACT path.
  */
object Rank {

  /** One row: `n` (total count, column name `countName`) plus, for each
    * `(name, rank)` in `namedRanks(n)`, the value of `value` at that 1-based
    * global rank of `df` ordered by `orderCols` (which must be existing
    * column names forming a total order — determinism needs no ties). Ranks
    * outside [1, n] yield NULL (so callers need no n=0 special case).
    *
    * EAGER — runs its own jobs against a scratch materialization, like the
    * layout queries (q56/q101); the returned frame is a local literal.
    */
  def valueAtRanks(df: DataFrame, orderCols: Seq[String], value: String,
                   namedRanks: Long => Seq[(String, Long)],
                   countName: String = "n",
                   numPartitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "Rank.valueAtRanks: need at least one order column")
    val spark = df.sparkSession
    val valueType = df.schema(value).dataType
    graft.engine.Scratch.withTempDir("graft-rank-") { tmp =>
      df.repartitionByRange(numPartitions, orderCols.map(col): _*)
        .withColumn("__pid", spark_partition_id())
        .write.mode("overwrite").parquet(s"$tmp/t")
      val parts = spark.read.parquet(s"$tmp/t")

      // Partition metadata: (pid, count) sorted by pid, cumulative offsets.
      val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = counts.map(_._2).sum
      val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)

      val wanted = namedRanks(n)
      val targets = wanted.map(_._2).distinct.filter(r => r >= 1 && r <= n)
      val picked: Map[Long, Any] =
        if (targets.isEmpty) Map.empty
        else selection(parts, orderCols, value, counts, offsets, targets)
          .collect().map(r => r.getLong(0) -> r.get(1)).toMap

      val row = Row.fromSeq(n +: wanted.map { case (_, r) => picked.get(r).orNull })
      val schema = StructType(
        StructField(countName, LongType, nullable = false) +:
          wanted.map { case (name, _) => StructField(name, valueType, nullable = true) })
      spark.createDataFrame(java.util.Arrays.asList(row), schema)
    }
  }

  /** Weighted prefix-threshold selection, the cumulative-share sibling of
    * [[valueAtRanks]]: for each `(name, target)` in
    * `namedTargets(totalWeight)`, find the FIRST row — in `orderCols`
    * order — at which the running sum of `weightCol` reaches `target`, and
    * report its 1-based global rank `k` and the running sum there. This is
    * the "how many vocabulary entries cover 90% of the corpus" question
    * asked distributively: same range-partition + frozen-scratch +
    * partition-metadata machinery, with per-partition WEIGHT sums giving
    * cumulative weight offsets, so each target cumulates inside exactly one
    * partition — no global sort, no single-partition window.
    *
    * `weightCol` must be integer-typed and non-negative (counts). Output:
    * one row per requested name — `(tname, k, cum, total)`; targets outside
    * [1, totalWeight] yield NULL k/cum. EAGER, like [[valueAtRanks]]. */
  def weightedPrefixThreshold(df: DataFrame, orderCols: Seq[String],
                              weightCol: String,
                              namedTargets: Long => Seq[(String, Long)],
                              numPartitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "Rank.weightedPrefixThreshold: need order columns")
    val spark = df.sparkSession
    graft.engine.Scratch.withTempDir("graft-prefix-") { tmp =>
      df.withColumn("__w", col(weightCol).cast("long"))
        .repartitionByRange(numPartitions, orderCols.map(col): _*)
        .withColumn("__pid", spark_partition_id())
        .write.mode("overwrite").parquet(s"$tmp/t")
      val parts = spark.read.parquet(s"$tmp/t")

      // Partition metadata: (pid, rows, weight) ascending, both prefixes.
      val meta = parts.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__c"), sum(col("__w")).as("__ws"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val totalW = meta.map(_._3).sum
      val cntOff = meta.map(_._1).zip(meta.map(_._2).scanLeft(0L)(_ + _).init).toMap
      val wOff = meta.map(_._1).zip(meta.map(_._3).scanLeft(0L)(_ + _).init).toMap

      val wanted = namedTargets(totalW)
      val targets = wanted.map(_._2).distinct.filter(t => t >= 1 && t <= totalW)
      val picked: Map[Long, (Long, Long)] =
        if (targets.isEmpty) Map.empty
        else {
          // Each target lives in the unique partition whose weight interval
          // contains it; only those partitions run the local cumsum window.
          val tp = targets.map { t =>
            val pid = meta.collectFirst {
              case (p, _, ws) if wOff(p) < t && wOff(p) + ws >= t => p
            }.getOrElse(sys.error(s"weightedPrefixThreshold: no partition holds $t"))
            (t, pid)
          }
          val hit = tp.map(_._2).distinct
          val tdf = spark.createDataFrame(tp.toList).toDF("__t", "__tpid")
          val odf = spark.createDataFrame(
            hit.map(p => (p, cntOff(p), wOff(p))).toList).toDF("__pid", "__coff", "__woff")
          val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
          parts.filter(col("__pid").isin(hit: _*))
            .withColumn("__lrn", row_number().over(w))
            .withColumn("__lrun", sum(col("__w")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .join(broadcast(odf), Seq("__pid"))
            .join(broadcast(tdf), col("__pid") === col("__tpid"))
            .filter(col("__woff") + col("__lrun") >= col("__t"))
            .groupBy(col("__t"))
            // run is monotone within the ordered partition, so min rank and
            // min running sum both belong to the same (first) qualifying row.
            .agg(min(col("__coff") + col("__lrn")).as("__k"),
              min(col("__woff") + col("__lrun")).as("__cum"))
            .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        }

      val rows = wanted.map { case (name, t) =>
        val hitRow = picked.get(t)
        Row(name, hitRow.map(_._1).orNull, hitRow.map(_._2).orNull, totalW)
      }
      val schema = StructType(Seq(
        StructField("tname", org.apache.spark.sql.types.StringType, nullable = false),
        StructField("k", LongType, nullable = true),
        StructField("cum", LongType, nullable = true),
        StructField("total", LongType, nullable = false)))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    }
  }

  /** Exact WEIGHTED median — the first value, in `orderCols` order, whose
    * cumulative weight reaches `⌈W/2⌉` — composed from the two existing
    * range-exchange primitives: [[weightedPrefixThreshold]] finds the global
    * ROW rank k of the threshold crossing, [[valueAtRanks]] fetches the
    * value at that rank under the same total order. Two data-parallel
    * passes, no global sort, no single-reducer window — the naive form is
    * `SUM(w) OVER (ORDER BY v)` over everything.
    *
    * `weightCol` must be integer non-negative; `orderCols` a total order
    * with the value column first. EAGER; one row out:
    * `(n, total_weight, k, median)` where `median` is NULL on empty input. */
  def weightedMedian(df: DataFrame, orderCols: Seq[String], valueCol: String,
                     weightCol: String, numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val th = weightedPrefixThreshold(df, orderCols, weightCol,
      totalW => Seq("med" -> (totalW + 1) / 2), numPartitions).collect().head
    val n = df.count()
    val k = if (th.isNullAt(1)) None else Some(th.getLong(1))
    val vr = k.map(rank => valueAtRanks(df, orderCols, valueCol,
      _ => Seq("median" -> rank), numPartitions = numPartitions).collect().head)
    val valueType = df.schema(valueCol).dataType
    val row = org.apache.spark.sql.Row(n, th.getLong(3), k.orNull,
      vr.map(_.get(1)).orNull)
    spark.createDataFrame(java.util.Arrays.asList(row), StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("total_weight", LongType, nullable = false),
      StructField("k", LongType, nullable = true),
      StructField("median", valueType, nullable = true))))
  }

  /** Robust outlier detection via median / MAD (median absolute deviation) —
    * the standard-deviation-free outlier rule (`|x − median| > k · MAD`) that
    * survives the corrupt extreme values which would inflate a mean/stddev
    * gate, composed from two [[valueAtRanks]] selections:
    *
    *   1. median = value at global rank `(n+1) DIV 2` of `valueCol` ordered
    *      by `(valueCol, idCol)` — the LOWER median, which keeps every
    *      quantity integer-exact (no midpoint interpolation);
    *   2. MAD = lower median of `|value − median|`, same rank arithmetic;
    *   3. one ordinary aggregate counts rows with `absdev > k · MAD` and
    *      checksums their ids.
    *
    * `valueCol` must be integer-typed (cents-style) and `idCol` a unique
    * tie-break, so every step is deterministic and engine-portable. EAGER
    * (two rank selections run their own jobs, like the layout queries);
    * the returned one-row frame is
    * `(n, median, mad, n_outliers, outlier_id_checksum)`.
    *
    * Scale: two range-exchange selections + one map-side-combined aggregate
    * — each pass data-parallel, no global sort anywhere (the whole point:
    * the naive form is `row_number() OVER (ORDER BY v)` twice). */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
                  k: Long = 3L, numPartitions: Int = 32): DataFrame = {
    require(k >= 1, s"Rank.madOutliers: k must be >= 1, got $k")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(idCol), col(valueCol))
    val median = valueAtRanks(vals, Seq(valueCol, idCol), valueCol,
        n => Seq("med" -> ((n + 1) / 2)), numPartitions = numPartitions)
      .head().getAs[Long]("med")
    val dev = vals.withColumn("__adev", abs(col(valueCol) - lit(median)))
    val mad = valueAtRanks(dev, Seq("__adev", idCol), "__adev",
        n => Seq("mad" -> ((n + 1) / 2)), numPartitions = numPartitions)
      .head().getAs[Long]("mad")
    dev.agg(count(lit(1)).as("n"),
      lit(median).as("median"), lit(mad).as("mad"),
      sum(when(col("__adev") > lit(k * mad), 1L).otherwise(0L)).as("n_outliers"),
      sum(when(col("__adev") > lit(k * mad), col(idCol)).otherwise(0L))
        .as("outlier_id_checksum"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance between the integer-typed
    * `valueCol` distributions of `a` and `b`, computed distributively with NO
    * global sort: KS = max over values v of |ECDF_a(v) − ECDF_b(v)|, kept as
    * the exact integer numerator `|cumA(v)·nB − cumB(v)·nA|` over the common
    * denominator nA·nB (cross-multiplied — never divides, same discipline as
    * tokenDrift/histogramDrift, so the maximum and its location are exact).
    *
    * The naive plan is a running sum over the FULL value order — an empty
    * PARTITION BY window, i.e. the single-reducer shape this file exists to
    * kill. Here the per-value count table (vocabulary-sized, ≪ data) goes
    * through the same range-exchange + frozen-scratch + partition-metadata
    * machinery as [[valueAtRanks]]: per-partition count sums collect as
    * metadata (one row per partition), cumulative offsets broadcast back, and
    * the running sums complete inside a `Window.partitionBy(__pid)` — every
    * sort partition-local.
    *
    * Output, one row: `(n_a, n_b, n_values, ks_num, ks_at)` where `ks_num` is
    * the max numerator and `ks_at` the SMALLEST value achieving it (ties
    * broken toward min value — deterministic). KS itself = ks_num / (nA·nB).
    * EAGER like [[valueAtRanks]]. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String,
              numPartitions: Int = 32): DataFrame = {
    val spark = a.sparkSession
    def cnts(df: DataFrame, out: String) =
      df.filter(col(valueCol).isNotNull)
        .select(col(valueCol).cast("long").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as(out))
    val m = cnts(a, "__ca").join(cnts(b, "__cb"), Seq("__v"), "full_outer")
      .select(col("__v"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    graft.engine.Scratch.withTempDir("graft-ks-") { tmp =>
      m.repartitionByRange(numPartitions, col("__v"))
        .withColumn("__pid", spark_partition_id())
        .write.mode("overwrite").parquet(s"$tmp/t")
      val parts = spark.read.parquet(s"$tmp/t")
      val meta = parts.groupBy(col("__pid"))
        .agg(count(lit(1)).as("__n"), sum(col("__ca")).as("__sa"),
          sum(col("__cb")).as("__sb"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      val nA = meta.map(_._3).sum
      val nB = meta.map(_._4).sum
      val nVals = meta.map(_._2).sum
      val outSchema = StructType(Seq(
        StructField("n_a", LongType, nullable = false),
        StructField("n_b", LongType, nullable = false),
        StructField("n_values", LongType, nullable = false),
        StructField("ks_num", LongType, nullable = false),
        StructField("ks_at", LongType, nullable = true)))
      if (nVals == 0) {
        spark.createDataFrame(
          java.util.Arrays.asList(Row(0L, 0L, 0L, 0L, null)), outSchema)
      } else {
        val offA = meta.map(_._1).zip(meta.map(_._3).scanLeft(0L)(_ + _).init)
        val offB = meta.map(_._1).zip(meta.map(_._4).scanLeft(0L)(_ + _).init)
        val offsetsDf = spark.createDataFrame(
          offA.zip(offB).map { case ((p, oa), (_, ob)) => (p, oa, ob) }.toList)
          .toDF("__pid", "__offa", "__offb")
        val best = ksAssembly(parts, offsetsDf, nA, nB).head()
        spark.createDataFrame(java.util.Arrays.asList(
          Row(nA, nB, nVals, best.getLong(0), best.getLong(1))), outSchema)
      }
    }
  }

  /** Contiguous total-order sharding for corpus export: assign every row of
    * `df` its global 1-based ordinal in `orderCols` order (a total order —
    * determinism needs no ties), cut the sequence into `numShards` contiguous
    * shards of near-equal size (`shard = ((ordinal−1)·numShards) DIV n`, the
    * balanced-split formula, sizes differing by ≤ 1), and return one summary
    * row per shard: `(shard, n_rows, min_ordinal, max_ordinal, id_checksum)`
    * with `id_checksum = sum(idCol)` over the shard's rows.
    *
    * This is q80's hash-sharding sibling for the exports that need ORDER —
    * curriculum-ordered training shards, length-bucketed eval splits — where
    * the naive `row_number() OVER (ORDER BY …)` is the canonical single-
    * reducer scale-killer. Same machinery as [[valueAtRanks]]: range
    * exchange, frozen scratch, per-partition counts as metadata → offsets,
    * ordinal = broadcast offset + partition-local `row_number`. At 100 TB the
    * per-shard output would be the written files themselves; the summary row
    * proves the assignment (contiguity: max−min+1 = n_rows; content: the id
    * checksum) at metadata size. EAGER like [[valueAtRanks]]. */
  def orderedShards(df: DataFrame, orderCols: Seq[String], idCol: String,
                    numShards: Int, numPartitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "Rank.orderedShards: need order columns")
    require(numShards >= 1, s"Rank.orderedShards: numShards must be >= 1")
    val spark = df.sparkSession
    graft.engine.Scratch.withTempDir("graft-shard-") { tmp =>
      df.repartitionByRange(numPartitions, orderCols.map(col): _*)
        .withColumn("__pid", spark_partition_id())
        .write.mode("overwrite").parquet(s"$tmp/t")
      val parts = spark.read.parquet(s"$tmp/t")
      val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = counts.map(_._2).sum
      val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
      val offsetsDf = spark.createDataFrame(offsets.toList).toDF("__pid", "__off")
      val rows =
        shardAssembly(parts, offsetsDf, orderCols, idCol, numShards, n).collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(Seq(
          StructField("shard", org.apache.spark.sql.types.IntegerType, nullable = true),
          StructField("n_rows", LongType, nullable = false),
          StructField("min_ordinal", LongType, nullable = true),
          StructField("max_ordinal", LongType, nullable = true),
          StructField("id_checksum", LongType, nullable = true))))
    }
  }

  /** Quantile normalization: map every group's value distribution onto the
    * GLOBAL distribution — row with within-group rank r of m becomes the
    * global value at rank `⌈r·N/m⌉` — so per-group feature distributions
    * (lengths, scores, prices) are comparable across sources with different
    * scales, preserving each group's internal order exactly. A group equal
    * to the whole input maps to itself (`⌈r·N/N⌉ = r`), and the mapping is
    * deterministic given a total order (`valueCol, idCol`).
    *
    * This needs a GLOBAL rank for every row — the classic empty-PARTITION-BY
    * single-reducer trap — so it reuses the [[valueAtRanks]] machinery:
    * range-repartition on `(valueCol, idCol)` into `scratchDir` (frozen, so
    * the sampled boundaries can't drift between the metadata action and the
    * result plan), per-partition counts collected as partition METADATA →
    * cumulative offsets, global rank = offset + per-partition row_number.
    * Every sort is partition-local; the target-rank lookup is an equi-join
    * on the computed global index.
    *
    * `scratchDir` must outlive consumption of the returned LAZY frame —
    * callers pass a `Scratch.withTempDir` scope (eager consumers) or an
    * exit-cleaned dir (lazy). Output: `(idCol, groupCol, valueCol,
    * norm_<valueCol>)`.
    *
    * Scale: one range exchange + two partition-local windows (per-`__pid`,
    * per-group) + one shuffle join on the global index. Driver state is one
    * row per partition. */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        idCol: String, scratchDir: String,
                        numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    df.repartitionByRange(numPartitions, col(valueCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(s"$scratchDir/qnorm")
    val parts = spark.read.parquet(s"$scratchDir/qnorm")
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetsDf = spark.createDataFrame(offsets.toList).toDF("__pid", "__off")
    quantileNormalizeAssembly(parts, offsetsDf, groupCol, valueCol, idCol, n)
  }

  /** The lazy plan of [[quantileNormalize]] — package-private so PlanSpec can
    * assert both windows are partition-bounded (per-`__pid`, per-group; no
    * empty PARTITION BY). */
  private[graft] def quantileNormalizeAssembly(parts: DataFrame, offsetsDf: DataFrame,
      groupCol: String, valueCol: String, idCol: String, n: Long): DataFrame = {
    val normCol = s"norm_$valueCol"
    val wPid = Window.partitionBy(col("__pid")).orderBy(col(valueCol), col(idCol))
    val globalRanked = parts
      .withColumn("__lrn", row_number().over(wPid))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .select((col("__off") + col("__lrn")).as("__g"), col(valueCol).as(normCol))
    val wGrp = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val wGrpAll = Window.partitionBy(col(groupCol))
    parts
      .withColumn("__r", row_number().over(wGrp).cast("long"))
      .withColumn("__m", count(lit(1)).over(wGrpAll))
      // ceil(r·N/m) in integers: (r·N + m − 1) DIV m — never a double ratio
      .withColumn("__g", expr(s"(__r * ${n}L + __m - 1) DIV __m"))
      .join(globalRanked, Seq("__g"))
      .select(col(idCol), col(groupCol), col(valueCol), col(normCol))
  }

  /** 2-D skyline (Pareto frontier): rows not dominated by any other —
    * p' dominates p when `x' ≥ x ∧ y' ≥ y` with at least one strict. The
    * multi-criteria shortlist operator ("longest AND highest-quality docs",
    * "most recent AND highest-value customers") whose naive form is a
    * quadratic NOT-EXISTS self-join.
    *
    * The O(n log n) shape, distributed: a row is dominated iff
    * `max{y' : x' > x} ≥ y` (someone strictly longer is also at least as
    * good) or `max{y' : x' = x} > y`. Both maxima come from ONE range
    * exchange on `x` descending: equal `x` never splits across partitions
    * (RangePartitioner keys whole values), so earlier partitions hold
    * strictly greater `x` — their per-partition y-maxima collapse to a
    * driver-side prefix max (one row per partition, the [[valueAtRanks]]
    * metadata license), while within a partition a descending RANGE-frame
    * window supplies the strict-greater-x max and a per-(pid, x) window the
    * equal-x max. No global sort, no self-join; duplicates of a frontier
    * point all survive (they don't dominate each other).
    *
    * `xCol`/`yCol` must be integer-typed (the RANGE frame's −1 bound means
    * "x' ≥ x+1" — exact only on integers). Output: the input columns,
    * frontier rows only. `scratchDir` must outlive consumption (lazy). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
                scratchDir: String, numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    df.repartitionByRange(numPartitions, col(xCol).desc)
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(s"$scratchDir/skyline")
    val parts = spark.read.parquet(s"$scratchDir/skyline")
    val pidMax = parts.groupBy(col("__pid")).agg(max(col(yCol)).as("__my"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // prefix max of y over partitions BEFORE pid (strictly larger x there)
    val prefix = pidMax.map(_._1).zip(
      pidMax.map(_._2).scanLeft(Long.MinValue)(math.max).init)
    val prefixDf = spark.createDataFrame(prefix.toList).toDF("__pid", "__pbest")
    skylineAssembly(parts, prefixDf, xCol, yCol, df.columns)
  }

  /** The lazy plan of [[skyline2D]] — package-private so PlanSpec can assert
    * both windows are partition-bounded. `__pbest` is Long.MinValue for the
    * first partition (empty prefix). */
  private[graft] def skylineAssembly(parts: DataFrame, prefixDf: DataFrame,
      xCol: String, yCol: String, outCols: Seq[String]): DataFrame = {
    val wAbove = Window.partitionBy(col("__pid")).orderBy(col(xCol).desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("__pid"), col(xCol))
    parts
      .join(broadcast(prefixDf), Seq("__pid"))
      .withColumn("__above",
        greatest(coalesce(max(col(yCol)).over(wAbove), lit(Long.MinValue)),
          col("__pbest")))
      .withColumn("__samex", max(col(yCol)).over(wSameX))
      .filter(!(col("__above") >= col(yCol) || col("__samex") > col(yCol)))
      .select(outCols.map(col): _*)
  }

  /** The lazy running-sum + argmax plan of [[ksDrift]] — package-private so
    * PlanSpec can assert the running sums stay inside per-`__pid` windows
    * (no global sort). `parts` carries (__v, __ca, __cb, __pid); `offsetsDf`
    * carries (__pid, __offa, __offb). One row out: (ks_num, ks_at). */
  private[graft] def ksAssembly(parts: DataFrame, offsetsDf: DataFrame,
                                nA: Long, nB: Long): DataFrame = {
    val w = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts
      .withColumn("__ra", sum(col("__ca")).over(w))
      .withColumn("__rb", sum(col("__cb")).over(w))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .select(col("__v"),
        abs((col("__offa") + col("__ra")) * nB
          - (col("__offb") + col("__rb")) * nA).as("__d"))
      // max diff, ties → smallest v: lexicographic max of (diff, -v).
      .agg(max(struct(col("__d"), (-col("__v")).as("__nv"))).as("__m"))
      .select(col("__m.__d").as("ks_num"), (-col("__m.__nv")).as("ks_at"))
  }

  /** The lazy ordinal + shard-summary plan of [[orderedShards]] —
    * package-private for PlanSpec: the only window is per-`__pid`, no global
    * sort anywhere. `parts` carries the data + `__pid`; `offsetsDf` carries
    * (__pid, __off). */
  private[graft] def shardAssembly(parts: DataFrame, offsetsDf: DataFrame,
                                   orderCols: Seq[String], idCol: String,
                                   numShards: Int, n: Long): DataFrame = {
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    parts
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("__ord", col("__off") + col("__lrn"))
      // integer DIV, not double `/` — bit-exact at any n
      .withColumn("shard", expr(s"CAST(((__ord - 1) * $numShards) DIV $n AS INT)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__ord")).as("min_ordinal"),
        max(col("__ord")).as("max_ordinal"),
        sum(col(idCol).cast("long")).as("id_checksum"))
  }

  /** Global MIN-TIE ranks (SQL `RANK()` semantics: tied values share the
    * rank of their first ordinal) for every row — the [[valueAtRanks]]
    * machinery again, so NO empty-PARTITION-BY window and no global sort:
    * range exchange on `(valueCol, idCol)` frozen to scratch, partition
    * counts → driver offsets (metadata license), ordinal = offset +
    * partition-local row_number, then the per-VALUE min ordinal joins back
    * on the value (a keyed shuffle; ties to a value never split across
    * range partitions, but the groupBy handles it regardless).
    *
    * Output: `(idCol, rank)` with rank ∈ [1, n]. `scratchDir` must outlive
    * consumption of the returned lazy frame. */
  def globalMinTieRanks(df: DataFrame, valueCol: String, idCol: String,
                        scratchDir: String, numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    df.select(col(valueCol), col(idCol))
      .repartitionByRange(numPartitions, col(valueCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .write.mode("overwrite").parquet(s"$scratchDir/ranks")
    val parts = spark.read.parquet(s"$scratchDir/ranks")
    val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    val offsetsDf = spark.createDataFrame(offsets.toList).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(valueCol), col(idCol))
    val ordinals = parts
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .select(col(idCol), col(valueCol), (col("__off") + col("__lrn")).as("__ord"))
    val firstOfValue = ordinals.groupBy(col(valueCol))
      .agg(min(col("__ord")).as("rank"))
    ordinals.join(firstOfValue, Seq(valueCol))
      .select(col(idCol), col("rank"))
  }

  /** Spearman rank-correlation SUFFICIENT STATISTICS over two columns —
    * min-tie ranks for each ([[globalMinTieRanks]] twice), joined on the id,
    * reduced to one exact row
    * `(n, sum_rx, sum_ry, sum_rxx, sum_ryy, sum_rxy)` in DECIMAL(38,0)
    * (rank products reach n³ summed — far past int64 at corpus scale).
    * ρ = (n·Σrxry − Σrx·Σry) / √((n·Σrx² − (Σrx)²)(n·Σry² − (Σry)²)) is
    * the consumer's float; the stored stats stay engine-exact, the
    * [[graft.engine.Profile.sufficientStats]] discipline applied to ranks. */
  def spearmanStats(df: DataFrame, xCol: String, yCol: String, idCol: String,
                    scratchDir: String, numPartitions: Int = 32): DataFrame = {
    val rx = globalMinTieRanks(df.select(col(xCol), col(idCol)), xCol, idCol,
      s"$scratchDir/x", numPartitions).withColumnRenamed("rank", "rx")
    val ry = globalMinTieRanks(df.select(col(yCol), col(idCol)), yCol, idCol,
      s"$scratchDir/y", numPartitions).withColumnRenamed("rank", "ry")
    rx.join(ry, Seq(idCol))
      .select(col("rx").cast("decimal(38,0)").as("rx"),
        col("ry").cast("decimal(38,0)").as("ry"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx")).as("sum_rx"), sum(col("ry")).as("sum_ry"),
        sum(col("rx") * col("rx")).as("sum_rxx"),
        sum(col("ry") * col("ry")).as("sum_ryy"),
        sum(col("rx") * col("ry")).as("sum_rxy"))
  }

  /** Exact AUC sufficient statistics — the Mann–Whitney U form of
    * ROC-AUC with midrank tie handling, the ranking-eval flagship computed
    * distributively: [[globalMinTieRanks]] supplies every score's global
    * min-tie rank (range-exchange + partition-offset machinery — no global
    * window), tie sizes come from one groupBy on the score, and
    * 2·midrank = 2·rank_min + t − 1 keeps everything integer. Then
    * 2U = Σ_pos 2·midrank − n_pos·(n_pos + 1) and
    * AUC = 2U / (2·n_pos·n_neg), exactly ½ when all scores tie.
    *
    * DECIMAL(38,0) internals ([[spearmanStats]]' discipline — the rank sum
    * reaches n² past int64 at corpus scale); query-level consumers cast
    * down per the oracle type contract. EAGER-scoped: `scratchDir` must
    * outlive consumption (callers wrap in `Scratch.withTempDir` and
    * collect, as q263 does). Output one row:
    * `(n_pos, n_neg, two_u)`. */
  def aucStats(df: DataFrame, scoreCol: String, labelCol: String,
               idCol: String, scratchDir: String,
               numPartitions: Int = 32): DataFrame = {
    val ranks = globalMinTieRanks(df.select(col(scoreCol), col(idCol)),
      scoreCol, idCol, s"$scratchDir/auc", numPartitions)
    val ties = df.groupBy(col(scoreCol)).agg(count(lit(1)).as("__t"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.select(col(idCol), col(scoreCol), col(labelCol).cast("long").as("__y"))
      .join(ranks, Seq(idCol))
      .join(ties, Seq(scoreCol))
      .agg(sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"),
        sum(when(col("__y") === 1L,
            dec(lit(2L) * col("rank") + col("__t") - 1L))
          .otherwise(dec(lit(0L)))).as("two_r_pos"))
      .select(col("n_pos"), col("n_neg"),
        (col("two_r_pos") - dec(col("n_pos")) * (dec(col("n_pos")) + 1))
          .as("two_u"))
  }

  /** Exact Gini-coefficient sufficient statistics of a non-negative size
    * distribution — THE key-skew diagnostic to run BEFORE committing to a
    * partitioning: Gini ≈ 0 means a hash-bucketed shuffle balances, Gini
    * near 1 means the hot keys need salting/AQE skew handling. Uses the
    * sorted-rank identity  G = (2·S − (n+1)·T) / (n·T)  with
    * S = Σᵢ i·x₍ᵢ₎ over ascending-sorted sizes. Ties are exact without a
    * total order: a block of m equal values starting at min-tie rank r₀
    * contributes x·(m·r₀ + m(m−1)/2) whatever intra-block order — so
    * [[globalMinTieRanks]] (range-exchange + partition offsets, NO global
    * window) supplies the ranks and one groupBy per (value, rank) block
    * closes the sum.
    *
    * DECIMAL(38,0) internals ([[spearmanStats]]' discipline — S reaches
    * n·T past int64 at corpus scale); query-level consumers cast down and
    * compute `(2·s − (n+1)·t)·1000 DIV (n·t)` per the oracle type
    * contract. Output one row: `(n, t, s)`. */
  def giniStats(df: DataFrame, valueCol: String, idCol: String,
                scratchDir: String, numPartitions: Int = 32): DataFrame = {
    val ranks = globalMinTieRanks(df.select(col(valueCol), col(idCol)),
      valueCol, idCol, s"$scratchDir/gini", numPartitions)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df.select(col(idCol), col(valueCol))
      .join(ranks, Seq(idCol))
      .groupBy(col(valueCol), col("rank"))
      .agg(count(lit(1)).as("m"))
      .agg(sum(col("m")).as("n"),
        sum(dec(col(valueCol)) * dec(col("m"))).as("t"),
        sum(dec(col(valueCol)) *
          (dec(col("m")) * dec(col("rank")) +
            dec(expr("(m * (m - 1)) DIV 2")))).as("s"))
  }

  /** Shared integer discount table for [[ndcgMicros]] and its oracle:
    * `disc(i) = ⌊10⁶ / log₂(i+1)⌋` for ranks 1..k. Flooring to micros makes
    * every DCG contribution an exact integer product — no float log, no
    * engine-variant association — while agreeing with the true discount to
    * 6 decimal places (the same fixed-point discipline as
    * [[graft.ext.Calibration.isotonicFit]]'s mean_micros). */
  def ndcgDiscountsMicros(k: Int): Seq[Long] =
    (1 to k).map(i => (1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** NDCG@k per group — the ranking-quality flagship next to [[aucStats]],
    * computed without floats: the model ranking is (scoreCol DESC, idCol)
    * and the ideal ranking (relCol DESC, idCol), both as windows partitioned
    * BY GROUP (never global); each rank-r item contributes
    * `rel · disc(r)` micros ([[ndcgDiscountsMicros]] literals indexed by the
    * row number — one `element_at` on a plan literal, fully codegen).
    *
    * Output per group: `(groupCol, dcg_micros, idcg_micros)` — consumers
    * micro-average by summing both columns (groups with all-zero relevance
    * contribute 0/0 and drop out of the ratio naturally).
    * NDCG = dcg/idcg; at k ≤ 10 and rel < 4 a group's DCG ≤ 3·10⁷, so
    * corpus-level BIGINT sums hold past 10¹¹ groups. */
  def ndcgMicros(df: DataFrame, groupCol: String, scoreCol: String,
                 relCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"Rank.ndcgMicros: k must be >= 1, got $k")
    val disc = typedlit(ndcgDiscountsMicros(k))
    val wModel = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wIdeal = Window.partitionBy(col(groupCol))
      .orderBy(col("__rel").desc, col(idCol))
    df.select(col(groupCol), col(scoreCol), col(relCol).cast("long").as("__rel"),
        col(idCol))
      .withColumn("__rm", row_number().over(wModel))
      .withColumn("__ri", row_number().over(wIdeal))
      .withColumn("__dcg",
        when(col("__rm") <= k, col("__rel") * element_at(disc, col("__rm")))
          .otherwise(lit(0L)))
      .withColumn("__idcg",
        when(col("__ri") <= k, col("__rel") * element_at(disc, col("__ri")))
          .otherwise(lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("__dcg")).as("dcg_micros"),
        sum(col("__idcg")).as("idcg_micros"))
  }

  /** The lazy selection plan of step 4–5 — package-private so PlanSpec can
    * assert it contains no single-partition exchange / global sort. `parts`
    * must carry the `__pid` column; `offsets` maps pid → rows before it. */
  private[graft] def selection(parts: DataFrame, orderCols: Seq[String],
                               value: String, counts: Seq[(Int, Long)],
                               offsets: Seq[(Int, Long)],
                               targets: Seq[Long]): DataFrame = {
    val spark = parts.sparkSession
    val offByPid = offsets.toMap
    // Only partitions whose rank interval contains a target need ranking —
    // at scale this prunes the window to ~|targets| partitions.
    val hitPids = counts.collect {
      case (pid, c) if targets.exists(r => r > offByPid(pid) && r <= offByPid(pid) + c) => pid
    }
    val offsetsDf = spark.createDataFrame(
      offsets.filter(o => hitPids.contains(o._1)).toList).toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    parts
      .filter(col("__pid").isin(hitPids: _*))
      .withColumn("__lrn", row_number().over(w))
      .join(broadcast(offsetsDf), Seq("__pid"))
      .withColumn("__rn", col("__off") + col("__lrn"))
      .filter(col("__rn").isin(targets: _*))
      .select(col("__rn"), col(value))
  }
}
