package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotProduct

/** Product quantization (PQ) for embedding compression + approximate search —
  * the memory-side complement to [[IVF]]'s partition-side pruning (the
  * IVF-PQ pairing of the Faiss/ScaNN family).
  *
  * A `dim`-float vector (256 bytes at dim=64) becomes `m` one-byte codes: the
  * vector is split into `m` contiguous subvectors, each quantized to its
  * nearest of `k ≤ 256` per-subspace centroids. At 100 TB of embeddings the
  * raw vectors do not fit executor memory; the coded corpus is 32-64× smaller
  * and distance evaluation against a query needs only an `m × k` lookup
  * table (ADC — asymmetric distance computation), computed ONCE per query on
  * the driver and inlined into a codegen'd expression. The scan is then
  * `m` array lookups + adds per row — no floating-point dot products over
  * the corpus at all.
  *
  * Deterministic end-to-end, same discipline as [[IVF]]: init = lowest-id
  * vectors' subvectors, fixed Lloyd iteration count, first-min tie-breaks —
  * so an independent run (or engine) reproduces the identical codes.
  *
  * Scale notes: training reduces `m × k × subDim` means per iteration via
  * one hash-agg (map-side combinable); only codebook metadata
  * (`m·k·subDim` doubles — at m=4,k=16,dim=64: 4 KiB) reaches the driver,
  * like any ANN library's index header. Encoding is a scan with plan-literal
  * codebooks. Search is scan + top-k; candidates can be exactly re-ranked
  * from the raw vectors of the top-`rerank` ids only.
  */
object PQ {

  /** Codebooks: codebooks(s)(j) = centroid j of subspace s (a subDim vector). */
  type Codebooks = Seq[Seq[Seq[Double]]]

  /** Subvector s of `v` (0-based), as a double array column. */
  private def subvec(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Index (0-based) of the nearest codebook entry for one subvector.
    * Same cancelled-norm argmin as [[IVF.nearestCell]]; `array_position`
    * takes the first minimum — deterministic. */
  private def nearestCode(sub: Column, codes: Seq[Seq[Double]]): Column = {
    val dists = array(codes.map { c =>
      val cLit = typedlit(c)
      val norm2 = c.map(x => x * x).sum
      dotProduct(sub, cLit) * lit(-2.0) + lit(norm2)
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train `m` per-subspace codebooks of `k` entries with `iters` Lloyd
    * iterations each. All subspaces train in the SAME distributed pass per
    * iteration: assignment adds one argmin column per subspace, the update
    * reduces per-(subspace, code, dim) means in one hash-agg. Empty codes
    * keep their previous centroid. */
  def train(embeddings: DataFrame, m: Int, k: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding"): Codebooks = {
    val base = embeddings.select(col(idCol).as("id"),
      Similarity.toDoubleArray(col(vecCol)).as("v"))
    val dim = base.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"PQ.train: dim $dim not divisible by m=$m")
    val subDim = dim / m

    val seed = base.orderBy("id").limit(k)
      .collect().map(_.getAs[scala.collection.Seq[Double]]("v").toSeq).toSeq
    var books: Codebooks =
      (0 until m).map(s => seed.map(v => v.slice(s * subDim, (s + 1) * subDim)))

    (1 to iters).foreach { _ =>
      val assigned = base.select(col("v") +:
        (0 until m).map(s =>
          nearestCode(subvec(col("v"), s, subDim), books(s)).as(s"c$s")): _*)
      // (subspace, code, pos) → mean, all subspaces in one aggregation
      val sums = assigned
        .select(explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), col(s"c$s").as("code"),
            subvec(col("v"), s, subDim).as("sub"))): _*)).as("e"))
        .select(col("e.s").as("s"), col("e.code").as("code"),
          posexplode(col("e.sub")).as(Seq("pos", "x")))
        .groupBy("s", "code", "pos")
        .agg(avg("x").as("mean"))
        .collect()
      val byKey = sums.groupBy(r => (r.getAs[Int]("s"), r.getAs[Int]("code")))
      books = books.zipWithIndex.map { case (codes, s) =>
        codes.zipWithIndex.map { case (old, j) =>
          byKey.get((s, j)) match {
            case Some(rows) =>
              rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mean")).toSeq
            case None => old
          }
        }
      }
    }
    books
  }

  /** Encode each vector to its `m` PQ codes (int array column `codes`). */
  def encode(embeddings: DataFrame, books: Codebooks,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.size
    val subDim = books.head.head.size
    embeddings.select(col(idCol),
        Similarity.toDoubleArray(col(vecCol)).as("v"))
      .withColumn("codes", array((0 until m).map(s =>
        nearestCode(subvec(col("v"), s, subDim), books(s))): _*))
      .drop("v")
  }

  /** ADC approximate squared distance of the coded corpus to `query`, then
    * exact cosine re-rank of the best `rerank` candidates; returns top-`k`
    * (idCol, cos_sim). The `m × k` distance table is computed driver-side
    * from the query and inlined as literal arrays — per corpus row the scan
    * does `m` element_at lookups and adds. */
  def search(embeddings: DataFrame, books: Codebooks, queryId: Long,
             k: Int, rerank: Int = 50,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = books.size
    val subDim = books.head.head.size
    val base = embeddings.select(col(idCol),
      Similarity.toDoubleArray(col(vecCol)).as("v"))
    val qv = base.filter(col(idCol) === queryId)
      .head().getAs[scala.collection.Seq[Double]]("v").toSeq

    // table(s)(j) = |q_s - c_{s,j}|² — the ADC lookup table
    val table: Seq[Seq[Double]] = books.zipWithIndex.map { case (codes, s) =>
      val qs = qv.slice(s * subDim, (s + 1) * subDim)
      codes.map(c => c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum)
    }

    val coded = encode(base.withColumnRenamed(idCol, "__id"), books, "__id", "v")
    val adc = (0 until m).map(s =>
        element_at(typedlit(table(s)), col("codes")(s) + 1))
      .reduce(_ + _)
    val candidates = coded
      .filter(col("__id") =!= queryId)
      .select(col("__id").as(idCol), adc.as("adc_dist"))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(rerank)

    // Exact re-rank joins ONLY the candidate ids back to raw vectors —
    // rerank rows, broadcast side.
    val qnorm = math.sqrt(qv.map(x => x * x).sum)
    base.join(broadcast(candidates), idCol)
      .select(col(idCol),
        round(dotProduct(col("v"), typedlit(qv)) /
          (sqrt(dotProduct(col("v"), col("v"))) * lit(qnorm)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
