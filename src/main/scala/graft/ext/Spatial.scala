package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed planar spatial join — the standard scale pattern for
  * "all pairs of points within radius r" without an all-pairs product.
  *
  * The naive within-radius self-join is O(n²) row comparisons and plans as
  * a cartesian product — the same scale-killer class as brute-force
  * near-dup (q28). The fix mirrors MinHash banding's shape: bucket points
  * into square grid CELLS of side r, equi-join on the cell key, and verify
  * candidates with an exact distance predicate:
  *
  *   - side A carries each point once, keyed by its OWN cell
  *     `(x div r, y div r)`;
  *   - side B is exploded to its 3×3 cell NEIGHBORHOOD (9 rows/point);
  *   - the equi-join on the cell key yields each candidate pair on EXACTLY
  *     one key — A's cell — because B's nine exploded keys are distinct, so
  *     no post-join dedup is needed;
  *   - the integer predicate `(xa−xb)² + (ya−yb)² ≤ r²` keeps exactly the
  *     true pairs.
  *
  * COMPLETENESS: |xa−xb| ≤ r forces |⌊xa/r⌋ − ⌊xb/r⌋| ≤ 1 (a difference of
  * 2 needs a gap > r), likewise in y — so every within-r pair lands in B's
  * 3×3 neighborhood of A's cell. Proven against the naive quadratic oracle
  * by q238's hash compare and the Round10cSpec property sweep.
  *
  * EXACTNESS: all-integer arithmetic — coordinates are grid integers, the
  * distance compare is on BIGINT squares (coords < 2³¹ keep d² < 2⁶³), so
  * membership is never decided by a float on either engine.
  *
  * SCALE: shuffle is |A| + 9·|B| rows hash-partitioned on the cell key;
  * per-cell work is density-bounded (expected points/cell = n·r²/area), so
  * the join never degenerates unless the data is globally clustered into
  * one cell — the skew-salting in [[graft.ext.Dedup]]'s banding applies
  * unchanged if a hot cell appears. Cell side = r is the textbook choice:
  * larger cells cut the 9× explode factor but grow candidate verification
  * quadratically within cells.
  */
object Spatial {

  /** All pairs `(id_a, id_b, d2)` with `id_a < id_b` and squared Euclidean
    * distance `d2 ≤ r²`, over `points(id: BIGINT, x: BIGINT, y: BIGINT)`
    * with NON-NEGATIVE integer coordinates (so `div` is floor division). */
  def withinRadiusPairs(points: DataFrame, r: Long): DataFrame = {
    require(r > 0, s"radius must be positive, got $r")
    val cells = points
      .withColumn("cx", expr(s"x DIV ${r}L"))
      .withColumn("cy", expr(s"y DIV ${r}L"))
    val a = cells.select(
      col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
      col("cx").as("kx"), col("cy").as("ky"))
    // 9 distinct neighbor keys per right-side point — one match per true pair
    val offsets = (for { dx <- -1 to 1; dy <- -1 to 1 }
      yield s"struct(CAST($dx AS BIGINT) AS dx, CAST($dy AS BIGINT) AS dy)")
      .mkString("array(", ", ", ")")
    val b = cells
      .withColumn("o", explode(expr(offsets)))
      .select(
        col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        (col("cx") + col("o.dx")).as("kx"), (col("cy") + col("o.dy")).as("ky"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    a.join(b, Seq("kx", "ky"))
      .where(col("id_a") < col("id_b") && (dx * dx + dy * dy) <= lit(r * r))
      .select(col("id_a"), col("id_b"), (dx * dx + dy * dy).as("d2"))
  }
}
