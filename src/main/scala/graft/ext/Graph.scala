package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph primitives over edge DataFrames.
  *
  * The dedup pipelines produce PAIRS (q24/q39); turning pairs into dedup
  * groups correctly needs the transitive closure — A~B and B~C put A,C in one
  * group even when (A,C) itself fell below threshold. Connected components is
  * the standard formulation (and what MapReduce-era dedup systems ran as the
  * final stage).
  */
object Graph {

  /** Hash-min label propagation: every vertex converges to the smallest
    * vertex id reachable from it. Returns (id, component).
    *
    * Each iteration is one shuffle (neighbor join + min-aggregate); rounds
    * needed = graph diameter, and near-dup graphs are shallow (dup clusters
    * are cliques or near-cliques, diameter ≤ 2-3), so 3-5 rounds close most
    * corpora. The driver only orchestrates — per-round work is fully
    * distributed. Each round's labels are persisted so round N's plan is one
    * level on top of round N-1's cache (bounded depth), and the SUPERSEDED
    * round is unpersisted as soon as the next one materializes — an earlier
    * localCheckpoint version leaked every round's blocks for the JVM's
    * lifetime, inflating unrelated queries 3-6× (PERF.md). At cluster scale,
    * `df.checkpoint()` to reliable storage also survives executor loss.
    * `maxIter` bounds the worst case (a path graph); the loop exits early on
    * convergence, detected by a count of changed labels. */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(level)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
      .persist(level)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val viaNeighbor = sym
        .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy("id").agg(min("component").as("component"))
        .persist(level)
      val changed = labels.as("a")
        .join(next.as("b"), col("a.id") === col("b.id"))
        .filter(col("a.component") =!= col("b.component"))
        .count() // materializes `next`, so the old round can be dropped
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
