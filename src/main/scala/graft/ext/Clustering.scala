package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact distributed Lloyd k-means + SemDeDup-style cluster-local
  * semantic dedup.
  *
  * Why another trainer next to [[IVF.train]]: IVF's centroids are float MEANS,
  * which are association-order-dependent — a different partitioning produces
  * different (equally valid) centroids, so q36 can only oracle an ANN recall
  * CONTRACT, never the clustering itself. Here every quantity is integer from
  * the first step: vectors are micros-quantized (`round(x·10⁶)`, the q91 /
  * centroidSimilarityMap convention DuckDB mirrors bit-exactly), centroid
  * update is `sum DIV count` (integer sums commute; truncating divide is
  * identical in Spark `DIV` and DuckDB `//`), and assignment breaks distance
  * ties by first-minimum cell id. The whole training run — init, every
  * iteration, the final assignment — therefore replays bit-for-bit on an
  * independent engine, which is what lets q352 hash-compare per-cluster sizes
  * AND inertia instead of a weaker contract check.
  *
  * Scale shape (the standard distributed Lloyd):
  *  - assignment is a map-only pass — centroids ride as `k×dim` plan literals
  *    (an index's metadata, same license as IVF/PQ), one codegen'd fold per
  *    (row, centroid), NO shuffle;
  *  - the update step posexplodes to (cluster, dim) and hash-aggregates —
  *    partial map-side combine means the shuffle carries ≤ `k·dim·partitions`
  *    rows regardless of corpus size;
  *  - only the `k×dim` centroid table reaches the driver between iterations.
  * At 100 TB with k=1024, dim=1024 the per-iteration exchange is ~1 M rows —
  * centroid-sized, not corpus-sized.
  *
  * Overflow budget: |component| ≤ 10⁶·max|x|; squared-distance folds bound by
  * `dim·(2·10⁶·max|x|)²` — with max|x| ≈ 0.6 and dim 64 that is ~10¹⁴, inside
  * int64 with three orders to spare. Sums: ≤ n·10⁶·max|x| per (cluster, dim).
  * The SemDeDup cosine gate squares a dot (≤ dim·(10⁶·max|x|)² ≈ 2·10¹³), so
  * its cross-multiplied comparison lifts to DECIMAL(38,0) — the spearman
  * discipline (products ≤ ~4·10³³ < 10³⁸).
  */
object Clustering {

  /** `round(x·10⁶)` per element as BIGINT — double arithmetic, round-half-away,
    * bit-identical to DuckDB's `round(CAST(x AS DOUBLE) * 1000000)`. */
  def quantizeMicros(vecCol: String): Column =
    expr(s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")

  /** Squared L2 distance between an `array<bigint>` column and a centroid
    * literal — a single codegen'd fold. */
  private def sqDist(v: Column, centroid: Seq[Long]): Column =
    aggregate(
      zip_with(v, typedlit(centroid), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** 0-based id of the nearest centroid; ties go to the FIRST minimum
    * (array_position returns the first match) — deterministic. */
  def nearestCluster(v: Column, centroids: Seq[Seq[Long]]): Column = {
    val dists = array(centroids.map(c => sqDist(v, c)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** `iters` Lloyd iterations over micros-quantized vectors. Init = the `k`
    * lowest-id vectors (deterministic); an empty cluster keeps its previous
    * centroid. Returns the final centroid table (k rows of dim longs). */
  def lloydTrainMicros(embeddings: DataFrame, k: Int, iters: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Seq[Seq[Long]] = {
    require(k >= 1 && iters >= 0, s"Clustering.lloydTrainMicros: need k >= 1, iters >= 0; got $k, $iters")
    val base = embeddings.select(col(idCol).as("id"), quantizeMicros(vecCol).as("v"))
    var centroids: Seq[Seq[Long]] = base.orderBy(col("id")).limit(k)
      .collect().map(_.getAs[scala.collection.Seq[Long]]("v").toSeq).toSeq
    (1 to iters).foreach { _ =>
      val assigned = base.withColumn("cl", nearestCluster(col("v"), centroids))
      // (cluster, dim) sums + cluster size: map-side combinable; k·dim rows out.
      val sums = assigned
        .select(col("cl"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cl"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCl = sums.groupBy(_.getAs[Int]("cl"))
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCl.get(i) match {
          case Some(rows) =>
            rows.sortBy(_.getAs[Int]("pos")).map { r =>
              val s = r.getAs[Long]("s"); val n = r.getAs[Long]("n")
              s / n // JVM Long division truncates toward zero = Spark DIV = DuckDB //
            }.toSeq
          case None => old
        }
      }
    }
    centroids
  }

  /** Final assignment under the trained centroids: `(id, v, cluster, dist2)`. */
  def assignMicros(embeddings: DataFrame, centroids: Seq[Seq[Long]],
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"), quantizeMicros(vecCol).as("v"))
    val dists = array(centroids.map(c => sqDist(col("v"), c)): _*)
    base
      .withColumn("cluster", (array_position(dists, array_min(dists)) - 1).cast("int"))
      .withColumn("dist2", array_min(dists))
  }

  /** Per-cluster training summary — the hash-comparable k-means certificate:
    * `(cluster, n_points, inertia, centroid_l1, id_checksum)` where inertia is
    * the exact integer within-cluster squared-distance sum and centroid_l1 the
    * L1 mass of the final centroid. */
  def kmeansSummary(embeddings: DataFrame, k: Int, iters: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val centroids = lloydTrainMicros(embeddings, k, iters, idCol, vecCol)
    val l1 = centroids.map(_.map(math.abs).sum)
    val l1Col = typedlit(l1)
    assignMicros(embeddings, centroids, idCol, vecCol)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("dist2")).as("inertia"),
        sum(col("id")).as("id_checksum"))
      .withColumn("centroid_l1", element_at(l1Col, col("cluster") + 1))
      .select(col("cluster"), col("n_points"), col("inertia"),
        col("centroid_l1"), col("id_checksum"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public literature):
    * k-means partitions the corpus, then near-duplicate pruning runs ONLY
    * within each cluster — the cluster assignment is the blocking key that
    * makes semantic dedup tractable (all-pairs over n/k-sized cells, never
    * the corpus). Keep rule: a vector is DROPPED iff some lower-id vector in
    * the SAME cluster has cosine ≥ thresholdMicrosSq′ — the same
    * lowest-id-survives prefix rule as the exact dedup family (the paper
    * keeps an arbitrary representative per similar group; lowest-id is the
    * deterministic choice).
    *
    * The cosine gate never leaves integers: `cos(a,b) ≥ θ` for positive dot
    * ⟺ `10⁶·dot² ≥ θ²micro6·‖a‖²·‖b‖²` with `θ²micro6 = round(θ²·10⁶)`,
    * evaluated in DECIMAL(38,0) (dot² ≈ 4·10²⁶ · 10⁶ stays < 10³⁸ at dim 64,
    * micros scale — the spearman lift).
    *
    * Scale: the pair join is equi on `cluster` with `id_a < id_b` — per-cell
    * all-pairs, the published SemDeDup cost model (cells are n/k and the k
    * knob bounds cell size); for hub cells compose with the per-cluster LSH
    * path (q83) exactly like hammingNearDuplicates' banding. Output: one row
    * per cluster: `(cluster, n_points, n_dropped, dropped_id_checksum)`. */
  def semDedupSummary(embeddings: DataFrame, k: Int, iters: Int,
                      thresholdMicroSq: Long,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(thresholdMicroSq >= 0 && thresholdMicroSq <= 1000000L,
      s"Clustering.semDedupSummary: thresholdMicroSq must be a cos² in micros [0, 1e6], got $thresholdMicroSq")
    val centroids = lloydTrainMicros(embeddings, k, iters, idCol, vecCol)
    val assigned = assignMicros(embeddings, centroids, idCol, vecCol)
      .withColumn("nrm2", aggregate(
        zip_with(col("v"), col("v"), (a, b) => a * b), lit(0L), (acc, x) => acc + x))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("v").as("va"), col("nrm2").as("na"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("v").as("vb"), col("nrm2").as("nb"))
    val dot = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val dec = "DECIMAL(38,0)"
    val dropped = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dot", dot)
      .where(col("dot") > 0 &&
        expr(s"CAST(1000000 AS $dec) * CAST(dot AS $dec) * CAST(dot AS $dec)") >=
          expr(s"CAST($thresholdMicroSq AS $dec) * CAST(na AS $dec) * CAST(nb AS $dec)"))
      .select(col("cluster"), col("id_b").as("id")).distinct()
    assigned.select(col("cluster"), col("id"))
      .join(dropped.withColumn("__d", lit(1L)), Seq("cluster", "id"), "left")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("__d").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("__d").isNotNull, col("id")).otherwise(0L)).as("dropped_id_checksum"))
  }
}
