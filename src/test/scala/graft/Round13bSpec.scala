package graft

import org.apache.spark.sql.functions._

import graft.ext.{Clustering, Privacy}

/** Round-13b specs: the integer-exact Lloyd trainer + SemDeDup cluster-local
  * dedup (q352/q353) and the t-closeness release audit (q354). */
class Round13bSpec extends SparkSpec {
  import spark.implicits._

  /** Two well-separated 2-D integer "embeddings" (micros land exactly on the
    * input×10⁶): group A = ids {0,2,4} around the origin, group B = ids
    * {1,3,5} around (1,1) — the two LOWEST ids (the deterministic seeds)
    * fall one per group, so Lloyd separates cleanly in one iteration. */
  private def twoClusters = Seq(
    (0L, Seq(0.000001f, 0.000002f)),
    (2L, Seq(0.000002f, 0.000001f)),
    (4L, Seq(0.000003f, 0.000003f)),
    (1L, Seq(1.000001f, 1.000002f)),
    (3L, Seq(1.000002f, 1.000001f)),
    (5L, Seq(1.000003f, 1.000003f))
  ).toDF("vec_id", "embedding")

  test("lloydTrainMicros: two clean groups converge to their exact truncated means") {
    val cents = Clustering.lloydTrainMicros(twoClusters, k = 2, iters = 3)
    // group A sums ((1+2+3), (2+1+3)) over n=3 -> (2, 2);
    // group B -> ((1000001+1000002+1000003) DIV 3, same) = (1000002, 1000002)
    assert(cents === Seq(Seq(2L, 2L), Seq(1000002L, 1000002L)))
  }

  test("lloydTrainMicros: iters=0 returns the k lowest-id seeds untouched") {
    val cents = Clustering.lloydTrainMicros(twoClusters, k = 2, iters = 0)
    assert(cents === Seq(Seq(1L, 2L), Seq(1000001L, 1000002L)))
  }

  test("kmeansSummary: sizes, inertia and centroid L1 are the hand-computed integers") {
    val out = Clustering.kmeansSummary(twoClusters, k = 2, iters = 3)
      .orderBy("cluster").collect()
    assert(out.length === 2)
    // per cluster, members vs the (2,2)-style centroid:
    // (1,2): 1, (2,1): 1, (3,3): 2 -> inertia 4 (same shifted for group B)
    out.foreach { r =>
      assert(r.getAs[Long]("n_points") === 3L)
      assert(r.getAs[Long]("inertia") === 4L)
    }
    assert(out.map(_.getAs[Long]("centroid_l1")).toSeq === Seq(4L, 2000004L))
    assert(out.map(_.getAs[Long]("id_checksum")).toSeq === Seq(6L, 9L))
  }

  test("kmeansSummary: an empty cluster keeps its previous centroid (identical seeds)") {
    val dup = Seq(
      (0L, Seq(0.5f, 0.5f)), (1L, Seq(0.5f, 0.5f)), (2L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    // k=2 seeds on two IDENTICAL vectors: every point ties and takes the
    // FIRST minimum -> cluster 0; cluster 1 goes empty and must keep its
    // seed centroid (a dropped entry would shrink the centroid list and
    // misindex centroid_l1's element_at)
    val out = Clustering.kmeansSummary(dup, k = 2, iters = 2)
      .orderBy("cluster").collect()
    assert(out.length === 1 && out.head.getAs[Int]("cluster") === 0)
    assert(out.head.getAs[Long]("n_points") === 3L)
    assert(out.head.getAs[Long]("inertia") === 0L)
  }

  test("semDedupSummary: exact copy always drops; cos²=1 threshold drops ONLY exact copies") {
    val emb = twoClusters.unionByName(Seq(
      (100L, Seq(0.000001f, 0.000002f)) // exact copy of vec 0 -> cluster A
    ).toDF("vec_id", "embedding"))
    // θ² = 0.990025 (cos ≥ 0.995): in micros group A's vectors are far from
    // parallel — (1,2)·(2,1) cos 0.8, (1,2)·(3,3) cos 0.9487 — so only the
    // planted copy drops there; group B's vectors differ by ±1 micro on a
    // 10⁶-length vector (cos ≈ 1 − 10⁻¹²), so ids 3 and 5 drop against
    // seed-id 1. Cluster-locality: nothing in A is ever implicated by B.
    val out = Clustering.semDedupSummary(emb, k = 2, iters = 2,
      thresholdMicroSq = 990025L).orderBy("cluster").collect()
    assert(out.map(_.getAs[Long]("n_points")).sum === 7L)
    val byCluster = out.map(r => r.getAs[Int]("cluster") ->
      (r.getAs[Long]("n_dropped"), r.getAs[Long]("dropped_id_checksum"))).toMap
    assert(byCluster(0) === ((1L, 100L)))
    assert(byCluster(1) === ((2L, 8L)))
    // θ² = 1.000000 exactly: dot² ≥ |a|²·|b|² holds only for truly parallel
    // vectors (Cauchy–Schwarz equality) — group B's near-parallel pairs
    // survive, the exact copy still drops
    val all = Clustering.semDedupSummary(emb, k = 2, iters = 2,
      thresholdMicroSq = 1000000L).collect()
    assert(all.map(_.getAs[Long]("n_dropped")).sum === 1L)
    assert(all.map(_.getAs[Long]("dropped_id_checksum")).sum === 100L)
  }

  test("tClosenessAudit: exact EMD integers; a representative group scores 0") {
    // global: band0 x6, band1 x2 (N=8, cums 6,8)
    // "half" (n=4, cum 2,4):  |2·8−6·4| + |4·8−8·4| = 8 + 0 = 8
    // "skew" (n=4, cum 4,4):  |4·8−6·4| + 0 = 8
    val df = Seq(
      ("half", 0L), ("half", 0L), ("half", 1L), ("half", 1L),
      ("skew", 0L), ("skew", 0L), ("skew", 0L), ("skew", 0L)
    ).toDF("grp", "band")
    val out = Privacy.tClosenessAudit(df, Seq("grp"), "band",
      bandDomain = Seq(0L, 1L), tPermille = 100L).collect()
    val byGrp = out.map(r => r.getAs[String]("grp") ->
      (r.getAs[Long]("n_g"), r.getAs[Long]("emd_num"),
        r.getAs[Long]("emd_denom"), r.getAs[Int]("t_violation"))).toMap
    assert(byGrp("half") === ((4L, 8L, 32L, 1))) // EMD 1/4 > t = 1/10
    assert(byGrp("skew") === ((4L, 8L, 32L, 1)))
    // groups that each mirror the global 50/50 split: EMD exactly 0
    val df2 = Seq(
      ("even", 0L), ("even", 1L), ("odd", 0L), ("odd", 1L)
    ).toDF("grp", "band")
    val out2 = Privacy.tClosenessAudit(df2, Seq("grp"), "band",
      bandDomain = Seq(0L, 1L), tPermille = 100L).collect()
    assert(out2.forall(_.getAs[Long]("emd_num") === 0L))
    assert(out2.forall(_.getAs[Int]("t_violation") === 0))
  }

  test("tClosenessAudit: missing bands contribute zero mass (grid completion matters)") {
    // group "lo" sits entirely in band 0; domain has 3 bands — without grid
    // completion the per-group cumsum would skip bands 1–2 and understate EMD
    val df = Seq(
      ("lo", 0L), ("lo", 0L),
      ("hi", 2L), ("hi", 2L)
    ).toDF("grp", "band")
    // N=4, global cums over (0,1,2) = (2,2,4)
    // lo (n=2, cums 2,2,2): |2·4−2·2| + |2·4−2·2| + |2·4−4·2| = 4+4+0 = 8
    val out = Privacy.tClosenessAudit(df, Seq("grp"), "band",
      bandDomain = Seq(0L, 1L, 2L), tPermille = 500L).collect()
    val lo = out.find(_.getAs[String]("grp") == "lo").get
    assert(lo.getAs[Long]("emd_num") === 8L)
    assert(lo.getAs[Long]("emd_denom") === 16L) // 2·4·(3−1)
    // EMD = 8/16 = 0.5 == t exactly -> strict > means NO violation at t
    assert(lo.getAs[Int]("t_violation") === 0)
  }

  test("tClosenessAudit: out-of-domain band raises instead of silently vanishing") {
    val df = Seq(("g", 0L), ("g", 7L)).toDF("grp", "band")
    val ex = intercept[Throwable] {
      Privacy.tClosenessAudit(df, Seq("grp"), "band",
        bandDomain = Seq(0L, 1L), tPermille = 100L).collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("band outside domain")),
      s"expected the domain guard to fire, got: ${messages(ex)}")
  }
}
