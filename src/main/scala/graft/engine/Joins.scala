package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-membership test against a pre-built filter, codegen'd.
  *
  * The filter object is shipped to executors through the generated code's
  * reference array (same mechanism Spark uses for its internal runtime
  * filters), so each task holds one shared read-only sketch — no per-row
  * driver traffic. Long keys probe `mightContainLong`; string keys probe the
  * UTF-8 bytes directly (`mightContainBinary`), bit-identical to what
  * `BloomFilter.putString` inserted, without materializing a java.lang.String
  * per row.
  */
case class MightContainKey(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => bf.mightContainLong(input.asInstanceOf[Long])
    case StringType => bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    case other => throw new IllegalArgumentException(
      s"graft_might_contain: unsupported key type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf, classOf[BloomFilter].getName)
    child.dataType match {
      case LongType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfRef.mightContainLong($c);")
      case StringType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bfRef.mightContainBinary($c.getBytes());")
      case other => throw new IllegalArgumentException(
        s"graft_might_contain: unsupported key type $other")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MightContainKey =
    copy(child = newChild)
}

/** Join-shape operators beyond the built-in strategies. */
object Joins {

  /** Build a bloom filter over `small`'s `key` column (long or string). */
  def buildBloom(small: DataFrame, key: String,
                 expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    small.stat.bloomFilter(key, expectedItems, fpp)

  /** Membership-probe column against a pre-built filter. */
  def mightContain(key: Column, bf: BloomFilter): Column =
    Bridge.column(MightContainKey(Bridge.expression(key), bf))

  /** Semi join of `large` against `small`'s keys with a bloom pre-filter.
    *
    * Shape: build a bloom sketch of the small side's key set on the driver
    * (one pass over the small side), probe it in the large side's scan stage,
    * then run the exact semi join on the survivors. The probe is a codegen'd
    * scalar op evaluated before the exchange, so at scale the shuffle moves
    * `(selectivity + fpp) · |large|` rows instead of `|large|` — for a 100 TB
    * fact table joined to a 0.1% key set at fpp 0.01, that is a ~99% cut in
    * shuffle bytes for the join's big side. False positives pass the probe but
    * are removed by the exact join, so the result is exactly the plain semi
    * join (the DuckDB oracle replays it as `IN (SELECT key ...)`).
    *
    * This is Spark's own runtime-row-level-filtering idea made explicit and
    * deterministic: AQE's version triggers heuristically; a pipeline that
    * *knows* its dimension predicate is selective shouldn't gamble on it.
    */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, key: String,
                    expectedItems: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val bf = buildBloom(small, key, expectedItems, fpp)
    large.filter(mightContain(col(key), bf))
      .join(small.select(col(key)).distinct(), Seq(key), "left_semi")
  }

  /** Distributed as-of (left) join: each left row picks up the `valCols` of the
    * latest right row with the same `key` and `right.ts <= left.ts`; left rows
    * with no such row keep nulls.
    *
    * Implementation is the union-and-carry trick: tag each side, union on the
    * shared (key, ts, valCols) shape, and run `last(value, ignoreNulls)` over a
    * (key)-partitioned window ordered by (ts, side) — right rows sort before
    * left rows at equal ts, so the match is inclusive. One shuffle on the key,
    * both sides arbitrary size: this is the scale path past
    * [[graft.functions.StepLookup]], which evaluates a *collected* series
    * (perfect for small reference curves, impossible for a per-key series that
    * doesn't fit the driver). Skewed keys behave like any skewed window
    * (salt the key or split hot entities upstream).
    *
    * If several right rows share (key, ts), the one sorting last by `valCols`
    * wins — deterministic, and mirrored by the oracle's max-value tiebreak. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(valCols.contains),
      s"asofJoin: value columns ${valCols.mkString(",")} collide with the left side")
    // Values are carried as ONE struct, not per-column: carrying each column
    // independently with ignoreNulls would backfill a NULL in the matched
    // right row's column from an OLDER right row — a combined row that never
    // existed. The struct itself is non-null exactly on right rows, so a
    // single ignoreNulls carry moves the whole matched row atomically (and a
    // legitimately NULL value inside it stays NULL).
    val packed = struct(valCols.map(col): _*)
    val r = right.select(
      leftCols.map(c => if (c == key || c == ts) col(c) else lit(null).as(c)) :+
        packed.as("__v") :+ lit(0).as("__side"): _*)
    val l = left.select(
      leftCols.map(col) :+
        lit(null).cast(r.schema("__v").dataType).as("__v") :+ lit(1).as("__side"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"), col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = false)
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valCols.map(c => col(s"__v.$c").as(c)): _*)
  }

  /** Point-in-interval join without a broadcast: bucketize time so the match
    * becomes an equi-join.
    *
    * Spark plans `point BETWEEN start AND end` against a non-broadcastable
    * interval side as a nested-loop/cartesian — O(|points|·|intervals|).
    * Flooring both sides to `bucketWidth` turns it into: explode each
    * interval over the buckets it covers (`(end-start)/W + 1` rows, ≈2 when W
    * is chosen near the interval length), map each point to its single
    * bucket, equi-join on the bucket, then apply the exact BETWEEN. Each
    * point lives in exactly one bucket, so no post-join dedup is needed.
    * Shuffle is |points| + ~2·|intervals| rows on an 8-byte key — the same
    * shape as any large equi-join, skew-handled by AQE. (The q42 broadcast
    * nested-loop stays the right plan when one side is tiny; this is the
    * both-sides-large path.)
    *
    * `ptCol`/`startCol`/`endCol` are int64 in the same unit (e.g. epoch µs);
    * bounds are inclusive. */
  def bucketedIntervalJoin(points: DataFrame, ptCol: String,
                           intervals: DataFrame, startCol: String, endCol: String,
                           bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketedIntervalJoin: bucketWidth must be positive")
    val ib = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketWidth"),
        expr(s"$endCol DIV $bucketWidth"))))
    points.withColumn("__bucket", expr(s"$ptCol DIV $bucketWidth"))
      .join(ib, "__bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Exact join-output cardinalities WITHOUT executing the join — the sizing
    * pass a pipeline runs before committing cluster hours to a join that may
    * explode (a many-to-many key nobody noticed turns a 100 TB equi-join into
    * a 10 PB write; this catches it for the cost of two aggregates).
    *
    * Returns one row `(n_inner, n_left_outer, n_right_outer, n_full_outer)`
    * — each EXACT, derived from per-key counts: matched output is
    * `Σ cntL(k)·cntR(k)` over shared non-null keys; outer variants add the
    * unmatched row counts (NULL keys never match, per SQL semantics, but do
    * survive their own side's outer join — both facts are reproduced here).
    *
    * Scale: two map-side-combined key aggregates (vocab-sized, the same
    * shuffle a group-by on the key costs), a vocab-sized merge, and 1-row
    * broadcasts — never the join itself. Overflow: Σ cntL·cntR < 2⁶³ caps the
    * *estimate*, not the inputs; a sum that would overflow int64 is itself
    * the "do not run this join" answer. */
  def joinCardinalities(left: DataFrame, leftKey: String,
                        right: DataFrame, rightKey: String): DataFrame = {
    val ca = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val cb = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cb"))
    // One full-outer merge of the two count tables; matched_a / matched_b are
    // the row counts that found a partner, so unmatched = total − matched.
    val m = ca.join(cb, Seq("__k"), "full_outer")
      .agg(
        coalesce(sum(col("__ca") * col("__cb")), lit(0L)).as("__matched"),
        coalesce(sum(when(col("__cb").isNotNull, col("__ca"))), lit(0L)).as("__ma"),
        coalesce(sum(when(col("__ca").isNotNull, col("__cb"))), lit(0L)).as("__mb"))
    val totals = left.agg(count(lit(1)).as("__na"))
      .crossJoin(right.agg(count(lit(1)).as("__nb")))
    m.crossJoin(broadcast(totals)).select(
      col("__matched").as("n_inner"),
      (col("__matched") + col("__na") - col("__ma")).as("n_left_outer"),
      (col("__matched") + col("__nb") - col("__mb")).as("n_right_outer"),
      (col("__matched") + col("__na") - col("__ma")
        + col("__nb") - col("__mb")).as("n_full_outer"))
  }

  /** FIFO allocation — match each unit of demand against the EARLIEST
    * unmatched unit of supply per key (inventory costing, lot matching,
    * order fulfillment). The set-based formulation that avoids any per-row
    * sequential loop: running-sum each side into half-open UNIT INTERVALS
    * (`supply row i covers [cum_{i-1}, cum_i)` of the key's cumulative
    * supply; demand likewise), and FIFO matching is exactly the pairwise
    * interval INTERSECTION — matched qty = overlap length. A classical
    * reformulation of the sequential algorithm as one join.
    *
    * Both sides order by `orderCols` (must totalize within the key);
    * quantities are integer. Per key the join degree is (rows with
    * overlapping cum-ranges) — each supply row overlaps O(1 + its span /
    * avg demand size) demand rows, so the pair count is linear in rows, not
    * quadratic. Output per key: `(n_pairs, matched_qty, supply_qty,
    * demand_qty)`; `matched_qty = min(supply, demand)` by construction —
    * the oracle re-derives it pairwise, so a windowing bug can't hide.
    *
    * Scale: two key-partitioned running-sum windows + one equi-join on the
    * key with a range residual — a hash/sort-merge join on the key, never a
    * loop join. */
  def fifoMatch(supply: DataFrame, demand: DataFrame, keyCol: String,
                qtyCol: String, orderCols: Seq[String]): DataFrame = {
    def ranged(df: DataFrame, tag: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      df.select(col(keyCol) +: col(qtyCol).cast("long").as("__q") +:
          orderCols.map(col): _*)
        .withColumn(s"__${tag}_end", sum(col("__q")).over(w))
        .withColumn(s"__${tag}_start", col(s"__${tag}_end") - col("__q"))
        .select(col(keyCol), col(s"__${tag}_start"), col(s"__${tag}_end"))
    }
    val sup = ranged(supply, "s")
    val dem = ranged(demand, "d")
    val pairs = sup.join(dem, Seq(keyCol))
      .filter(col("__s_start") < col("__d_end") && col("__d_start") < col("__s_end"))
      .select(col(keyCol),
        (least(col("__s_end"), col("__d_end"))
          - greatest(col("__s_start"), col("__d_start"))).as("__m"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__m")).as("matched_qty"))
    val supTot = sup.groupBy(col(keyCol)).agg(max(col("__s_end")).as("supply_qty"))
    val demTot = dem.groupBy(col(keyCol)).agg(max(col("__d_end")).as("demand_qty"))
    supTot.join(demTot, Seq(keyCol), "full_outer")
      .join(pairs, Seq(keyCol), "left")
      .select(col(keyCol),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("matched_qty"), lit(0L)).as("matched_qty"),
        coalesce(col("supply_qty"), lit(0L)).as("supply_qty"),
        coalesce(col("demand_qty"), lit(0L)).as("demand_qty"))
  }
}
