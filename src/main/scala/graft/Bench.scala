package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query three times — a warm-up
  * execution and TWO measured reps — and prints ONE JSON line whose
  * per-query number is the MIN of the two warm reps.
  *
  * Why a warm-up pass: all ~100 plans run sequentially in one JVM, so a
  * single timed run charges whichever query happens to execute first (or right
  * after a GC-heavy neighbor) with JIT/codegen-compile/old-gen-churn costs that
  * have nothing to do with the plan. Round-1/2 benches reported 100s+ for
  * queries whose isolated steady-state is <5s (see PERF.md). The warm-up run
  * absorbs codegen compilation and page-cache misses. `cold_total_sec` keeps
  * the first-run total visible for anyone who wants the
  * end-to-end-including-warmup picture.
  *
  * Why min-of-two warm reps, reported with the full rep list (`warm_reps`):
  * single warm runs still swing several-fold environmentally — the recorded
  * history has q60/q65 moving 3–15s across rounds with identical code
  * (PERF.md) — so a one-sample number invites chasing noise round over
  * round. The min of two reps is the standard steady-state estimator (noise
  * on a shared box is one-sided: GC, compaction, page-cache eviction only
  * ADD time), and the rep list keeps the spread inspectable so a reader can
  * tell a real regression (both reps slow) from environment (one slow rep).
  *
  * Failures are never swallowed: a query that throws reports -1 and lands in
  * the "errors" map with its exception, so a broken plan is visible in the
  * bench JSON instead of masquerading as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // One execution of `name`: returns elapsed seconds, or -1 on failure
    // (recording the exception). Cache entries are dropped before moving on:
    // each query is a standalone workload, and a persisted projection surviving
    // into later queries only adds GC pressure there.
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            val msg = (e.getClass.getName + ": " + Option(e.getMessage).getOrElse(""))
              .replaceAll("[\\\\\"\\n\\r\\t]", " ").take(300)
            errors(name) = msg
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // clearCache only drops SQL-cached plans; localCheckpoint/persist RDD
      // blocks (e.g. the connected-components rounds) survive it and would
      // hold storage memory into later queries' timings.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      if (ok) dt else -1.0
    }

    // Optional comma-separated name filter for targeted iteration
    // (SPARK_GRAFT_BENCH_ONLY=q111_change_feed,q127_pagerank); the driver
    // never sets it, so the per-round artifact always covers every query.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)

    // Stable name order (not Map hash order).
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val cold = runOnce(name, fn)
      val reps = Seq(runOnce(name, fn), runOnce(name, fn))
      val warm = reps.filter(_ >= 0) match {
        case Nil => -1.0
        case ok => ok.min
      }
      (name, cold, warm, reps)
    }

    def jmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._3))
    val cold = jmap(results.map(r => r._1 -> r._2))
    val repsJson = results.map { case (name, _, _, reps) =>
      "\"" + name + "\":[" + reps.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._3).filter(_ >= 0).sum
    val coldTotal = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$coldTotal,"cold":$cold,"warm_reps":$repsJson,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    // A failed query must fail the bench run visibly, not just in-band.
    if (errors.nonEmpty) sys.exit(1)
  }
}
