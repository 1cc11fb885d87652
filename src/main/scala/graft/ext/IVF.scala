package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotProduct

/** IVF (inverted-file) approximate nearest neighbor: Lloyd-quantized centroid
  * cells + probe-limited exact search.
  *
  * - **Train**: a few distributed Lloyd iterations. Assignment is a pure-column
  *   argmin over `-2·v·c + |c|²` (the row-constant `|v|²` cancels) with centroids
  *   as plan literals — one codegen'd dot per (row, centroid). The update step
  *   reduces per-(cell, dim) means via posexplode + hash agg; only the
  *   `nCells × dim` centroid table ever reaches the driver (an index's metadata,
  *   like any ANN library).
  * - **Search**: rank centroids for the query, take the `nProbe` nearest cells,
  *   scan only those cells' vectors with exact cosine. Recall is tunable with
  *   `nProbe`/`nCells`; candidates are scored exactly, so precision is 1.
  *
  * Deterministic end-to-end: init = lowest-id vectors, fixed iteration count,
  * first-min tie-breaks.
  *
  * Scale: assignment/update are scan + hash-agg (no shuffle wider than
  * `nCells × dim` rows); search reads only `nProbe / nCells` of the corpus —
  * the IVF trade documented in the ANN literature (e.g. Faiss's IVF family).
  */
object IVF {

  /** Squared-distance argmin rank expression: cell index (0-based) of the
    * nearest centroid. `array_position` takes the first minimum — deterministic. */
  private def nearestCell(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val dists = array(centroids.map { c =>
      val cLit = typedlit(c)
      val norm2 = c.map(x => x * x).sum
      dotProduct(v, cLit) * lit(-2.0) + lit(norm2)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train centroids with `iters` Lloyd iterations from a deterministic seed
    * (the `nCells` lowest-id vectors). Empty cells keep their previous centroid. */
  def train(embeddings: DataFrame, nCells: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] = {
    val base = embeddings.select(col(idCol).as("id"),
      Similarity.toDoubleArray(col(vecCol)).as("v"))
    var centroids: Seq[Seq[Double]] = base.orderBy("id").limit(nCells)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toSeq).toSeq
    (1 to iters).foreach { _ =>
      val assigned = base.withColumn("cell", nearestCell(col("v"), centroids))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(avg("x").as("mean"))
        .collect()
      val byCell = sums.groupBy(_.getAs[Int]("cell"))
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        byCell.get(i) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean")).toSeq
          case None => old
        }
      }
    }
    centroids
  }

  /** Assign every vector to its centroid cell — the inverted file. Persisting /
    * re-partitioning this by `cell` is the on-disk index layout. */
  def assign(embeddings: DataFrame, centroids: Seq[Seq[Double]],
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol),
      Similarity.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("cell", nearestCell(col("v"), centroids))

  /** Top-k by cosine for the query vector with id `queryId`, probing only the
    * `nProbe` cells nearest to the query. */
  def search(embeddings: DataFrame, centroids: Seq[Seq[Double]], queryId: Long,
             k: Int, nProbe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val indexed = assign(embeddings, centroids, idCol, vecCol)
      .withColumn("norm", sqrt(dotProduct(col("v"), col("v"))))
    val q = indexed.filter(col(idCol) === queryId)
      .select(col("v").as("qv"), col("norm").as("qnorm"), col("cell").as("qcell"))
      .collect().head
    val qv = q.getAs[scala.collection.Seq[Double]]("qv").toSeq
    // rank cells by centroid distance to the query (driver-side: nCells rows)
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }
      .take(nProbe).map(_._1)
    indexed
      .filter(col("cell").isin(probeCells: _*) && col(idCol) =!= queryId)
      .select(col(idCol),
        round(dotProduct(col("v"), typedlit(qv)) /
          (col("norm") * lit(math.sqrt(qv.map(x => x * x).sum))), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
