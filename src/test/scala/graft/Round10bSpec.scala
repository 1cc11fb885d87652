package graft

import org.apache.spark.sql.functions._
import graft.engine.Incremental
import graft.ext.{Graph, Sampling}

/** Round-10 second tranche: modularity, raking, exclusive commits. */
class Round10bSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------- modularity

  test("modularityMicro matches the hand-computed two-triangles example") {
    // Two disjoint triangles, partitioned by their components: m = 6,
    // per cluster e_c = 3, d_c = 6 → term = ⌊10⁶·(4·6·3 − 36)/(4·36)⌋ =
    // ⌊10⁶·36/144⌋ = 250000; Q = 0.5 exactly → 500000 micro.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("id_a", "id_b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L), (6L, 20L))
      .toDF("node", "label")
    val r = Graph.modularityMicro(edges, labels).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 2L, 6L, 500000L)))
  }

  test("modularityMicro scores the everything-in-one-cluster partition zero") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val labels = Seq(1L, 2L, 3L, 4L).map((_, 99L)).toDF("node", "label")
    val r = Graph.modularityMicro(edges, labels).collect().head
    assert(r.getLong(3) === 0L, "e_c/m and (d_c/2m)² must cancel exactly")
  }

  test("modularityMicro penalizes a partition that cuts edges") {
    // Path 1-2-3 split as {1,2} vs {3}: m=2, cluster A: e=1, d=3; B: e=0, d=1.
    // termA = ⌊10⁶(8−9)/16⌋ = ⌊−62500⌋ = −62500; termB = ⌊10⁶(0−1)/16⌋ = −62500.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("node", "label")
    val r = Graph.modularityMicro(edges, labels).collect().head
    assert(r.getLong(3) === -125000L)
  }

  test("modularityMicro raises loudly on an unlabeled endpoint") {
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 1L)).toDF("node", "label") // node 2 missing
    val e = intercept[Exception] {
      Graph.modularityMicro(edges, labels).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unlabeled endpoint")))
  }

  // ---------------------------------------- raking

  test("rakeWeights converges weighted marginals toward the targets") {
    // skewed cells: rows a/b at 900/100, cols x/y at 900/100 observed;
    // targets 500/500 on both axes.
    val df = (Seq.fill(810)(("a", "x")) ++ Seq.fill(90)(("a", "y")) ++
      Seq.fill(90)(("b", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("r", "c")
    val out = Sampling.rakeWeights(df, col("r"), col("c"),
      Seq("a" -> 500L, "b" -> 500L), Seq("x" -> 500L, "y" -> 500L), iters = 2)
    val cells = out.collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val total = 1000L
    def mass(pred: ((String, String)) => Boolean) =
      cells.filter { case (k, _) => pred(k) }.values.map { case (n, w) => n * w }.sum
    // after 2 rounds each row marginal should be within 1% of target·N
    val targetMass = 500L * total // per-mille × N
    Seq[((String, String)) => Boolean](_._1 == "a", _._1 == "b", _._2 == "x", _._2 == "y")
      .foreach { p =>
        val m = mass(p)
        assert(math.abs(m - targetMass) <= targetMass / 100,
          s"marginal mass $m not within 1% of $targetMass")
      }
  }

  test("rakeWeights fails loudly on an uncovered level") {
    val df = Seq(("a", "x"), ("z", "x")).toDF("r", "c")
    val e = intercept[Exception] {
      Sampling.rakeWeights(df, col("r"), col("c"),
        Seq("a" -> 1000L), Seq("x" -> 1000L), iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("no row target")))
  }

  // ---------------------------------------- multi-table transactions

  test("commitTransaction: readers never see a torn cross-table state") {
    val a0 = Seq(("x", 1L)).toDF("k", "v"); val b0 = Seq(("y", 10L)).toDF("k", "v")
    val a1 = Seq(("x", 2L)).toDF("k", "v"); val b1 = Seq(("y", 20L)).toDF("k", "v")
    withTempDir { dir =>
      val st = s"$dir/txn"
      Incremental.commitTransaction(Map("a" -> a0, "b" -> b0), st, 0L)
      assert(Incremental.readTableAtLatestTxn(spark, st, "a").head().getLong(1) === 1L)
      // crash simulation: table a stages v=1 but the txn marker never lands
      Incremental.commitVersion(a1, s"$st/a", 1L)
      assert(Incremental.readTableAtLatestTxn(spark, st, "a").head().getLong(1) === 1L,
        "a staged-but-unpublished version must stay invisible")
      assert(Incremental.latestTxn(spark, st) === Some(0L))
      // the full transaction publishes both tables atomically
      Incremental.commitTransaction(Map("a" -> a1, "b" -> b1), st, 1L)
      assert(Incremental.readTableAtLatestTxn(spark, st, "a").head().getLong(1) === 2L)
      assert(Incremental.readTableAtLatestTxn(spark, st, "b").head().getLong(1) === 20L)
      // replaying a published transaction loses loudly
      intercept[java.util.ConcurrentModificationException] {
        Incremental.commitTransaction(Map("a" -> a1, "b" -> b1), st, 1L)
      }
    }
  }

  // ---------------------------------------- optimistic concurrency

  test("commitVersionExclusive: second writer of the same version loses loudly") {
    val df = Seq((1L, "a")).toDF("id", "v")
    withTempDir { dir =>
      Incremental.commitVersionExclusive(df, s"$dir/state", 0L)
      intercept[java.util.ConcurrentModificationException] {
        Incremental.commitVersionExclusive(df, s"$dir/state", 0L)
      }
      // the losing attempt must not have corrupted the committed version
      assert(Incremental.latestUpsertStateBefore(spark, s"$dir/state", Long.MaxValue)
        .get.count() === 1L)
      // and the winner's successor commits cleanly
      Incremental.commitVersionExclusive(df.withColumn("v", lit("b")), s"$dir/state", 1L)
      assert(Incremental.committedVersions(spark, s"$dir/state") === Seq(0L, 1L))
    }
  }
}
