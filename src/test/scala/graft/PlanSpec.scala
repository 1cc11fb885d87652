package graft

/** Physical-plan regression guards for the plan properties PERF.md documents
  * as load-bearing. These string-match the executed plan of real driver
  * queries on the sf0.001 tables — if an optimizer upgrade or a refactor
  * silently de-broadcasts a dimension join or reintroduces interpreted
  * PivotFirst, a spec fails rather than a benchmark quietly regressing.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q42 bracket range-join broadcasts the 4-row dimension (nested loop, not cartesian shuffle)") {
    assert(planOf("q42_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q14 dimension joins are broadcast hash joins") {
    val p = planOf("q14_region_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dimension join:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join must not sort-merge")
  }

  test("q07 pivot compiles to conditional aggregation, not interpreted PivotFirst") {
    assert(!planOf("q07_inventory_net_position").toLowerCase.contains("pivotfirst"))
  }

  test("q01 daily KPIs aggregate with a map-side partial pass") {
    val p = planOf("q01_daily_sales_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("q19 semi/anti joins stay semi/anti in the physical plan") {
    val p = planOf("q19_semi_anti_join")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("q20 token stats scan prunes to the referenced columns only") {
    val p = planOf("q20_token_stats")
    val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(read.contains("text") || read.contains("doc_id"), s"no ReadSchema found:\n$p")
    assert(!read.contains("embedding"), s"scan must not read unrelated columns: $read")
  }

  test("Hive date-partitioned layout prunes partitions on a date-filtered read") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      val df = Seq(
        (1L, "2024-01-01 10:00:00"), (2L, "2024-01-02 10:00:00"),
        (3L, "2024-01-03 10:00:00")).toDF("id", "ts")
        .withColumn("ts", to_timestamp(col("ts")))
      graft.engine.Layout.withDatePartitions(df, col("ts"))
        .write.partitionBy(graft.engine.Layout.partitionColumns: _*).parquet(s"$dir/t")
      val read = spark.read.parquet(s"$dir/t")
        .filter(col("year") === 2024 && col("month") === 1 && col("day") === 2)
      val p = read.queryExecution.executedPlan.toString
      // The partition predicate must reach the file index (PartitionFilters),
      // not run as a post-scan Filter over all three day directories.
      assert(p.contains("PartitionFilters") &&
        "PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined,
        s"day predicate must prune partitions:\n$p")
      assert(read.count() == 1)
    }
  }

  test("q337 TPC-DS Q64 shape broadcasts every dimension join") {
    val p = planOf("q337_tpcds_q64_shape")
    // customer/nation/part are dims — all three must come in as broadcast
    // hash joins; only the (cust, part) channel-chain self-join may shuffle.
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected 3 broadcast dimension joins:\n$p")
  }

  test("q364 TPC-DS Q34 shape: band HAVING stays between the aggregates; customer join broadcasts") {
    val p = planOf("q364_tpcds_q34_shape")
    assert(p.contains("BroadcastHashJoin"),
      s"customer dimension must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q365 TPC-DS Q29 shape: all three legs are hash joins on narrow keys, part broadcasts") {
    val p = planOf("q365_tpcds_q29_shape")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"date-window residuals must ride equi hash joins, never a cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"part dimension must broadcast:\n$p")
  }

  test("q375 TPC-DS Q54 shape: the cohort IN decorrelates to a semi-join, no cartesian") {
    val p = planOf("q375_tpcds_q54_shape")
    assert(p.contains("LeftSemi") || p.contains("left_semi"),
      s"cohort IN must plan as a semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q339 TPC-DS Q67 shape: rollup expands once and the rank window partitions by level") {
    val p = planOf("q339_tpcds_q67_shape")
    assert(p.contains("Expand"), s"ROLLUP must plan as Expand:\n$p")
    assert(p.contains("Window"), s"expected the rank window:\n$p")
    // the window must partition by lvl (grouping level), not run globally
    assert("Window .*partitionBy|Window \\[.*lvl".r.findFirstIn(p).isDefined
      || p.contains("lvl"), s"rank window must partition by lvl:\n$p")
  }

  test("q347 TPC-DS Q23 shape: IN filters become semi-joins and the max-spend gate is a subquery, never a cartesian") {
    val p = planOf("q347_tpcds_q23_shape")
    assert(p.contains("LeftSemi"), s"IN filters must plan as semi-joins:\n$p")
    assert(p.toLowerCase.contains("subquery"),
      s"the MAX(spend) threshold must decorrelate into a scalar subquery:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("q348 TPC-DS Q78 shape: NOT EXISTS plans as an anti-join") {
    val p = planOf("q348_tpcds_q78_shape")
    assert(p.contains("LeftAnti"), s"the returns filter must be an anti-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the anti-join must stay an equi-join:\n$p")
  }

  test("q350 TPC-DS Q95 shape: IN and EXISTS both decorrelate to semi-joins on the orderkey") {
    val p = planOf("q350_tpcds_q95_shape")
    assert(p.contains("LeftSemi"), s"both membership tests must be semi-joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the supp <> supp disequality must ride the ok equi-join as a residual:\n$p")
  }

  test("q351 TPC-DS Q11 shape: the 4-way cust self-join stays equi, no cartesian") {
    val p = planOf("q351_tpcds_q11_shape")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all four CTE consumers must join on cust:\n$p")
  }

  test("hub-basket cap (q242/q245 path): ONE b-exchange serves dedup, cap window, and the pair self-join") {
    import spark.implicits._
    val baskets = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 13L))
      .toDF("b", "i")
    // assert on the CONSUMER pipeline (pairCounts), where the exchange
    // budget actually matters: the explicit repartition(b) must satisfy the
    // dedup, the cap window, and both self-join sides, so Catalyst never
    // ADDS a b-keyed exchange — the only ENSURE_REQUIREMENTS exchange is
    // the final pair-count aggregate on (p1, p2). (On this tiny fixture one
    // join side may broadcast, duplicating the EXPLICIT repartition into
    // both subtrees — that is fixture-size noise, not an added exchange.)
    val p = graft.ext.Itemsets.pairCounts(baskets, "b", "i", 1000L)
      .queryExecution.executedPlan.toString
    val required = """Exchange hashpartitioning\([^)]*\), ENSURE_REQUIREMENTS"""
      .r.findAllIn(p).toList
    assert(required.length == 1 && required.head.contains("i#"),
      s"the only required exchange must be the pair aggregate, got $required:\n$p")
    assert(!p.contains("LeftAnti"),
      s"the cap is a window filter on the shared b-partitioning, not a join:\n$p")
  }

  test("q64 as-of join plans as one windowed pass, not a nested loop") {
    val p = planOf("q64_asof_distributed")
    assert(p.contains("Window"), s"expected union-and-carry window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of must not degenerate to a loop join:\n$p")
  }

  test("q66 interval join plans as an equi-join on the bucket, not a loop join") {
    val p = planOf("q66_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketized interval join must be an equi-join:\n$p")
  }

  test("q85 top-ngrams compiles to TakeOrderedAndProject, never a global sort") {
    val p = planOf("q85_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), s"expected per-partition top-k:\n$p")
    assert(!p.contains("Sort "), s"top-k must not materialize a global sort:\n$p")
  }

  test("q84 unpivot is a single Expand over the aggregate — no extra exchange") {
    val p = planOf("q84_unpivot")
    assert(p.contains("Expand"), s"expected Expand-based unpivot:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"unpivot must add no shuffle beyond the pivot aggregate's:\n$p")
  }

  test("q91 int8 quantization runs the codegen expression, not an interpreted HOF") {
    val p = planOf("q91_int8_quantize")
    assert(p.contains("graft_int8_quantize"), s"expected Int8Quantize expression:\n$p")
  }

  test("q95 NOT IN plans as a null-aware anti join, not a rewrite to left_anti") {
    val p = planOf("q95_null_aware_anti")
    assert(p.toLowerCase.contains("leftanti"), s"expected anti join operators:\n$p")
  }

  test("q108 bucketed join reads co-located buckets — no exchange, no per-query sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      spark.sql("DROP TABLE IF EXISTS graft_plan_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_plan_bkt_b")
      try {
        (1L to 200L).map(k => (k, k * 10)).toDF("k", "v")
          .write.bucketBy(4, "k").sortBy("k")
          .option("path", s"$dir/a").saveAsTable("graft_plan_bkt_a")
        (1L to 200L).map(k => (k, s"s$k")).toDF("k", "s")
          .write.bucketBy(4, "k").sortBy("k")
          .option("path", s"$dir/b").saveAsTable("graft_plan_bkt_b")
        // Disable broadcast so the co-location, not a broadcast, kills the shuffle.
        val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val joined = spark.table("graft_plan_bkt_a")
            .join(spark.table("graft_plan_bkt_b"), "k")
          val p = joined.queryExecution.executedPlan.toString
          assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
          assert(!p.contains("Exchange"),
            s"bucketed sides must satisfy the join's distribution without a shuffle:\n$p")
          assert(joined.count() === 200L)
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_plan_bkt_a")
        spark.sql("DROP TABLE IF EXISTS graft_plan_bkt_b")
      }
    }
  }

  test("q103 point-in-time join stays a hash equi-join, never a nested loop") {
    val p = planOf("q103_pit_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected a hash equi-join on the key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the validity window must stay a post-join filter, not join machinery:\n$p")
  }

  test("q97 rank selection stays partition-local — no single-partition exchange or global sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      // Materialize a parts table the way Rank.valueAtRanks does, then assert
      // the selection plan (the piece that replaced q97's global rank window)
      // never funnels data through one partition.
      (1 to 1000).map(i => ((i * 37) % 1000L, s"u$i")).toDF("lag_us", "user_id")
        .repartitionByRange(8, col("lag_us"), col("user_id"))
        .withColumn("__pid", spark_partition_id())
        .write.parquet(s"$dir/t")
      val parts = spark.read.parquet(s"$dir/t")
      val counts = parts.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
      val sel = graft.ext.Rank.selection(parts, Seq("lag_us", "user_id"), "lag_us",
        counts, offsets, targets = Seq(1L, 500L, 900L, 1000L))
      val p = sel.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange SinglePartition"),
        s"rank selection must not gather to one partition:\n$p")
      assert(!p.contains("], true, 0"), s"rank selection must not global-sort:\n$p")
      assert(p.contains("Window"), s"expected per-partition rank window:\n$p")
      // And the selected values are the exact order statistics.
      val got = sel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sorted = (1 to 1000).map(i => (i * 37) % 1000L).sorted
      assert(got == Map(1L -> sorted(0), 500L -> sorted(499), 900L -> sorted(899),
        1000L -> sorted(999)))
    }
  }

  test("q115 weighted sample top-k is TakeOrderedAndProject, never a global sort") {
    val p = planOf("q115_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"expected distributed top-k:\n$p")
  }

  test("q116 count-min estimate probes via a broadcast hash join on (d, bucket)") {
    val p = planOf("q116_countmin_sketch")
    assert(p.contains("BroadcastHashJoin"), s"merged sketch must broadcast:\n$p")
  }

  test("tombstone merge-on-read subtracts via a broadcast anti join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { root =>
      (1L to 5000L).toDF("k").write.parquet(s"$root/data")
      graft.engine.Tombstones.append(Seq(1L, 2L).toDF("k"), s"$root/tomb", 0L)
      val p = graft.engine.Tombstones
        .readMergeOnRead(spark, s"$root/data", s"$root/tomb", Seq("k"))
        .queryExecution.executedPlan.toString
      assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"small tombstone set must broadcast, not shuffle the table:\n$p")
    }
  }

  test("q55 bloom probe runs in the scan stage, before the semi join's exchange") {
    val p = planOf("q55_bloom_semi_join")
    // The probe must be a Filter under the large side's scan, not post-join:
    // in the plan string the graft_might_contain filter has to appear *below*
    // (after, textually) the semi join operator it feeds.
    val probeIdx = p.indexOf("graft_might_contain")
    val joinIdx = p.indexOf("LeftSemi")
    assert(probeIdx >= 0, s"bloom probe missing from plan:\n$p")
    assert(joinIdx >= 0, s"exact semi join missing from plan:\n$p")
    assert(probeIdx > joinIdx,
      s"bloom probe must sit under the join (scan stage), not above it:\n$p")
  }

  test("q129 fuzzy join: both candidate paths are hash equi-joins, never nested loops") {
    val p = planOf("q129_fuzzy_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected equi-join candidate generation:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"PassJoin signatures and the short-string length band must equi-join:\n$p")
  }

  test("q132 posting lists: top-token pruning is a broadcast join; window only after pruning") {
    val p = planOf("q132_posting_lists")
    assert(p.contains("BroadcastHashJoin"),
      s"10-token top list must broadcast back onto the postings:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 token selection must be TakeOrdered, not a global sort:\n$p")
  }

  test("q136 token drift: top-k is TakeOrdered and totals broadcast — no global sort") {
    val p = planOf("q136_token_drift")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k drifted tokens must be TakeOrdered, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the 1-row totals must broadcast, not cartesian-shuffle:\n$p")
  }

  test("q137 join sizing never executes the sized join or funnels to one partition") {
    val p = planOf("q137_join_size")
    // The only joins allowed are the vocab-sized count-table merge and the
    // 1-row totals broadcast; the sized many-to-many join itself must not run.
    assert(!p.contains("CartesianProduct"),
      s"1-row totals must broadcast, not cartesian-shuffle:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final key-count aggregates on both sides:\n$p")
  }

  test("q143 novelty probe is a semi join on the shingle hash, never a nested loop") {
    val p = planOf("q143_novelty")
    assert(p.contains("LeftSemi"), s"reference probe must stay a semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"novelty must never go all-pairs:\n$p")
  }

  test("q144 erasure audit broadcasts the subject set into scan-speed semi joins") {
    val p = planOf("q144_erasure_audit")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"subjects must broadcast; each table pays one scan-speed semi join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no data-table shuffle is acceptable for a request-sized subject set:\n$p")
  }

  test("q127 pagerank: plan depth is constant across iterations (rebind, no lineage blowup)") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L)).toDF("src", "dst")
    def depth(iters: Int): Int =
      graft.ext.Graph.pageRankIterations(edges, iters)
        .queryExecution.executedPlan.toString.linesIterator.size
    val d1 = depth(1)
    val d4 = depth(4)
    assert(d4 == d1,
      s"pagerank plan grew with iteration count ($d1 lines at 1 iter, $d4 at 4) — " +
        "the per-round rebind must keep the analyzed plan O(1) in iters")
  }

  test("q148 label propagation: plan depth is constant across rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq((1L, 0L), (5L, 1L)).toDF("node", "label")
    def depth(iters: Int): Int =
      graft.ext.Graph.labelPropagation(edges, seeds, iters)
        .queryExecution.executedPlan.toString.linesIterator.size
    val d1 = depth(1)
    val d3 = depth(3)
    assert(d3 == d1,
      s"label propagation plan grew with rounds ($d1 lines at 1, $d3 at 3) — " +
        "the persisted-union rebind must keep the plan O(1) in rounds")
  }

  test("q131 cohort retention: pruned scan, partial aggs, no loop join, no 1-partition funnel") {
    val p = planOf("q131_cohort_retention")
    assert(p.contains("ReadSchema: struct<ts:") && !p.contains("props"),
      s"events scan must prune to (ts, user_id):\n$p")
    assert(p.contains("partial_count") && p.contains("partial_min"),
      s"both aggregations must combine map-side before their exchange:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"first-touch join must stay a hash equi-join on user_id:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"cohort rollup must never funnel through one partition:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3,
      s"expected at most 3 hash exchanges (distinct, first-touch partial, rollup), got $exchanges:\n$p")
  }

  test("q149 BPE pair top-1 is TakeOrderedAndProject over a map-side-combined count") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cur = Seq((2L, "·a·b·"), (1L, "·a·b·c·")).toDF("freq", "seq")
    val p = graft.ext.TextAnalysis.bpePairTop(cur)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"BPE round winner must be TakeOrdered, not a global sort:\n$p")
    assert(p.contains("partial_sum"),
      s"pair counts must combine map-side before the exchange:\n$p")
  }

  test("q150 rolling distinct: explode + hash aggregates, no loop join, no 1-partition funnel") {
    val p = planOf("q150_rolling_active")
    assert(p.contains("Generate explode"), s"expected bounded window-day explode:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"active-day semi join must stay a hash/broadcast equi-join:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"per-day counts must never funnel through one partition:\n$p")
  }

  test("q151 heavy hitters: recount pass pushes the candidate filter into the scan") {
    val out = SparkEntry.queries("q151_heavy_hitters")(spark, sf)
    val p = out.queryExecution.executedPlan.toString
    // The second pass filters to ≤ capacity candidate keys before its one
    // hash aggregate — no join, no second full-table pass shape.
    assert(p.contains("HashAggregate"), s"expected hash-aggregate recount:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate recount must be a filter, not a join:\n$p")
  }

  test("q157 prefix-filter join: candidates and verify are hash equi-joins, never nested loops") {
    val p = planOf("q157_prefix_jaccard_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"prefix-token candidate join must stay an equi-join on the shingle:\n$p")
    assert(p.contains("HashAggregate"), s"expected map-combined frequency/distinct aggs:\n$p")
  }

  test("q155 co-occurrence pairs come from a per-doc explode, not a token self-join shuffle") {
    val p = planOf("q155_cooccurrence_lift")
    assert(p.contains("Generate explode"), s"expected bounded per-doc pair explode:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must be TakeOrdered:\n$p")
    assert(!p.contains("CartesianProduct"), s"no token-level cartesian anywhere:\n$p")
  }

  test("q159 top paths: one per-user window, top-k via TakeOrdered") {
    val p = planOf("q159_top_paths")
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"both leads must ride ONE window pass:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must be TakeOrdered:\n$p")
  }

  test("q160 bootstrap computes all replicas in one aggregate pass (no per-replica scan)") {
    val p = planOf("q160_bootstrap_replicas")
    val scans = p.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected ONE orders scan for all 16 replicas, got $scans:\n$p")
    assert(p.contains("partial_sum"), s"conditional aggs must combine map-side:\n$p")
  }

  test("q161 key-cardinality histogram is two map-combined hash aggregates") {
    val p = planOf("q161_key_cardinality")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"expected partial+final for both groupings:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"distribution rollup must not funnel through one partition:\n$p")
  }

  test("q158 join-view maintenance prunes via broadcast key joins, never a loop join") {
    val p = planOf("q158_join_view_maintenance")
    assert(p.contains("BroadcastHashJoin"),
      s"delta-key anti/semi prunes must broadcast the touched-key set:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"maintenance must stay hash equi-joins:\n$p")
  }

  test("q152/q153 assemblies: running sums and ordinals stay inside per-partition windows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      (1 to 500).map(i => (i.toLong, (i % 7).toLong, ((i * 3) % 5).toLong))
        .toDF("__v", "__ca", "__cb")
        .repartitionByRange(6, col("__v"))
        .withColumn("__pid", spark_partition_id())
        .write.parquet(s"$dir/t")
      val parts = spark.read.parquet(s"$dir/t")
      val offs = (0 until 6).map(p => (p, p * 10L, p * 20L))
        .toDF("__pid", "__offa", "__offb")
      val ks = graft.ext.Rank.ksAssembly(parts, offs, 100L, 100L)
        .queryExecution.executedPlan.toString
      assert(!ks.contains("], true, 0"), s"KS running sum must not global-sort:\n$ks")
      assert(ks.contains("Window") && ks.contains("windowspecdefinition(__pid"),
        s"expected per-__pid running-sum window:\n$ks")

      val shardOffs = (0 until 6).map(p => (p, p * 10L)).toDF("__pid", "__off")
      val sh = graft.ext.Rank.shardAssembly(parts.withColumnRenamed("__ca", "id"),
        shardOffs, Seq("__v"), "id", numShards = 4, n = 500L)
        .queryExecution.executedPlan.toString
      assert(!sh.contains("], true, 0"), s"ordinal pass must not global-sort:\n$sh")
      assert(!sh.contains("Exchange SinglePartition") || sh.contains("HashAggregate"),
        s"shard summary must not funnel data rows through one partition:\n$sh")
      assert(sh.contains("windowspecdefinition(__pid"),
        s"expected per-__pid row_number window:\n$sh")
    }
  }

  test("q162/q164 sweep-line and spike windows stay key-partitioned, no global sort") {
    val p = planOf("q162_peak_concurrency")
    assert(p.contains("windowspecdefinition(event_type"),
      s"expected per-event_type running-sum window:\n$p")
    assert(!p.contains("], true, 0"), s"sweep-line must not global-sort:\n$p")
    val p2 = planOf("q164_spike_detection")
    assert(p2.contains("windowspecdefinition(event_type"),
      s"expected per-event_type trailing windows:\n$p2")
    assert(!p2.contains("], true, 0"), s"spike pass must not global-sort:\n$p2")
  }

  test("q169 aggregate pushdown reaches the parquet scan (COUNT/MIN/MAX from footers)") {
    val v1Key = "spark.sql.sources.useV1SourceList"
    val aggKey = "spark.sql.parquet.aggregatePushdown"
    val prevV1 = spark.conf.get(v1Key)
    val prevAgg = spark.conf.get(aggKey)
    spark.conf.set(v1Key,
      prevV1.split(",").map(_.trim).filterNot(_ == "parquet").mkString(","))
    spark.conf.set(aggKey, "true")
    try {
      val p = graft.engine.Skipping.pushedAggregateFrame(
        spark, s"$sf/lineitem.parquet", Seq("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedAggregation: [COUNT(*), MIN(l_orderkey), MAX(l_orderkey)]"),
        s"expected footer-level aggregate pushdown:\n$p")
    } finally {
      spark.conf.set(v1Key, prevV1)
      spark.conf.set(aggKey, prevAgg)
    }
  }

  test("q170 streaks: island window is per-user, no global sort") {
    val p = planOf("q170_streaks")
    assert(p.contains("windowspecdefinition(user_id"),
      s"expected per-user island window:\n$p")
    assert(!p.contains("], true, 0"), s"streaks must not global-sort:\n$p")
  }

  test("q187 TPC-H Q5 snowflake: dimensions broadcast, no cartesian product") {
    val p = planOf("q187_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims:\n$p")
    assert(!p.contains("CartesianProduct"), s"snowflake must not go cartesian:\n$p")
  }

  test("q186/q188 top-N SQL compiles to TakeOrderedAndProject, never a global sort") {
    Seq("q186_tpch_q3", "q188_tpch_q10").foreach { q =>
      val p = planOf(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q: expected top-N operator:\n$p")
    }
  }

  test("q209 TPC-H Q18: the IN(GROUP BY HAVING) subquery plans as a semi join, top-N stays TakeOrdered") {
    val p = planOf("q209_tpch_q18")
    assert(p.contains("LeftSemi"),
      s"q209: the large-order subquery must rewrite to a semi join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q209: expected top-N operator:\n$p")
  }

  test("q210 TPC-H Q21: EXISTS/NOT EXISTS plan as semi + anti joins, nation dim broadcasts") {
    val p = planOf("q210_tpch_q21")
    assert(p.contains("LeftSemi"), s"q210: EXISTS must rewrite to a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"q210: NOT EXISTS must rewrite to an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q210: the supplier/nation dims must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q210: expected top-N operator:\n$p")
  }

  test("q236 TPC-H Q17: correlated scalar subqueries decorrelate to aggregate joins, part dim broadcasts") {
    val p = planOf("q236_tpch_q17")
    // the correlated per-part aggregates must become joins against a grouped
    // aggregate of lineitem — never a per-row nested-loop re-execution
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q236: correlated subquery left a nested-loop/cartesian shape:\n$p")
    assert(p.contains("LeftOuter"),
      s"q236: expected the decorrelated aggregate joined back LeftOuter:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q236: the brand+type-filtered part dim must broadcast:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_brand)"),
      s"q236: part's brand/type filters must reach the scan:\n$p")
  }

  test("q237 TPC-H Q22: NOT EXISTS plans as anti join; global-average scalar subqueries stay one-row plans") {
    val p = planOf("q237_tpch_q22")
    assert(p.contains("LeftAnti"), s"q237: NOT EXISTS must rewrite to an anti join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q237: scalar-subquery comparison must not become a nested loop:\n$p")
    assert(p.contains("Subquery"),
      s"q237: the uncorrelated balance aggregates should run as scalar subqueries:\n$p")
  }

  test("q265–q279 TPC-H frontend family: no plan goes cartesian or nested-loop") {
    // blanket pin for the round-11 batch (Q1, Q2, Q4, Q6–Q9, Q11–Q16, Q19,
    // Q20): whatever Catalyst does to the decorrelation/grouping shapes,
    // none may fall back to per-row re-execution. Targeted shape pins below.
    val family = Seq("q265_tpch_q1", "q266_tpch_q2", "q267_tpch_q4",
      "q268_tpch_q6", "q269_tpch_q7", "q270_tpch_q8", "q271_tpch_q9",
      "q272_tpch_q11", "q273_tpch_q12", "q274_tpch_q13", "q275_tpch_q14",
      "q276_tpch_q15", "q277_tpch_q16", "q278_tpch_q19", "q279_tpch_q20")
    family.foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: cartesian/nested-loop shape in the plan:\n$p")
    }
  }

  test("q266 TPC-H Q2: correlated min-cost decorrelates; dims broadcast; top-N stays TakeOrdered") {
    val p = planOf("q266_tpch_q2")
    assert(p.contains("BroadcastHashJoin"),
      s"q266: supplier/nation/region/part dims must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q266: expected top-N operator:\n$p")
  }

  test("q267 TPC-H Q4: EXISTS plans as a semi join") {
    assert(planOf("q267_tpch_q4").contains("LeftSemi"))
  }

  test("q268 TPC-H Q6: every predicate reaches the lineitem scan") {
    val p = planOf("q268_tpch_q6")
    assert(p.contains("PushedFilters:") && p.contains("IsNotNull(l_shipdate)"),
      s"q268: shipdate/discount/quantity filters must push to parquet:\n$p")
    assert(!p.contains("Join"), s"q268: Q6 has no join:\n$p")
  }

  test("q274 TPC-H Q13: the customer spine survives as a left outer join") {
    val p = planOf("q274_tpch_q13")
    assert(p.contains("LeftOuter"), s"q274: expected left outer join:\n$p")
  }

  test("q277 TPC-H Q16: NOT IN plans as an anti join") {
    val p = planOf("q277_tpch_q16")
    assert(p.contains("LeftAnti"), s"q277: NOT IN must become an anti join:\n$p")
  }

  test("q279 TPC-H Q20: nested IN + correlated scalar decorrelate to semi joins over an aggregate") {
    val p = planOf("q279_tpch_q20")
    assert(p.contains("LeftSemi"), s"q279: the supplier IN must become a semi join:\n$p")
    assert(p.contains("LeftOuter"),
      s"q279: the correlated 1997-demand aggregate should join back LeftOuter:\n$p")
  }

  test("q238 spatial grid join: candidates meet on the cell equi-key, never a cross product") {
    val p = planOf("q238_grid_spatial_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q238: the within-radius join must stay cell-bucketed:\n$p")
    // the 9-way neighbor explode feeds an equi-join keyed on (kx, ky)
    assert(p.contains("kx") && p.contains("ky") && p.contains("Generate explode"),
      s"q238: expected the exploded neighbor-cell equi-join:\n$p")
  }

  test("q261 relational division: the FOR-ALL shape runs as join machinery, not per-row re-execution") {
    val p = planOf("q261_relational_division")
    assert(p.contains("LeftAnti"),
      s"q261: NOT EXISTS must become an anti join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q261: division must not plan a cross product:\n$p")
  }

  test("q263 Spearman: every window is partition-bounded (no global rank window on the distributed side)") {
    // spearmanStats is scratch-backed; assert on the assembly over a tiny fixture
    import spark.implicits._
    val base = (1L to 50L).map(i => (i, i * 3 % 17, i * 5 % 13)).toDF("id", "x", "y")
    withTempDir { tmp =>
      val stats = ext.Rank.spearmanStats(base, "x", "y", "id", tmp)
      val p = stats.queryExecution.executedPlan.toString
      val hasGlobalWindow = stats.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }.nonEmpty
      assert(!hasGlobalWindow, s"q263: found an empty-PARTITION-BY window:\n$p")
      stats.collect() // consume inside the scratch scope
    }
  }

  test("q181 skyline assembly: windows per-partition, prefix maxima broadcast, no global sort") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      (1 to 200).map(i => (i.toLong, (i * 7 % 50).toLong, (i * 11 % 50).toLong))
        .toDF("id", "x", "y")
        .repartitionByRange(4, col("x").desc)
        .withColumn("__pid", spark_partition_id())
        .write.parquet(s"$dir/t")
      val parts = spark.read.parquet(s"$dir/t")
      val prefix = (0 until 4).map(p => (p, Long.MinValue)).toDF("__pid", "__pbest")
      val plan = graft.ext.Rank.skylineAssembly(parts, prefix, "x", "y", Seq("id", "x", "y"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("windowspecdefinition(__pid"),
        s"skyline windows must be per-partition:\n$plan")
      assert(!plan.contains("], true, 0"), s"skyline must not global-sort:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"prefix maxima must broadcast:\n$plan")
    }
  }

  test("q168 quantile-normalize assembly: both windows partition-bounded, offsets broadcast") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    withTempDir { dir =>
      (1 to 300).map(i => (i.toLong, s"s${i % 3}", (i * 11 % 97).toLong))
        .toDF("id", "grp", "v")
        .repartitionByRange(5, col("v"), col("id"))
        .withColumn("__pid", spark_partition_id())
        .write.parquet(s"$dir/t")
      val parts = spark.read.parquet(s"$dir/t")
      val offs = (0 until 5).map(p => (p, p * 60L)).toDF("__pid", "__off")
      val plan = graft.ext.Rank.quantileNormalizeAssembly(parts, offs, "grp", "v", "id", 300L)
        .queryExecution.executedPlan.toString
      assert(plan.contains("windowspecdefinition(__pid"),
        s"global-rank window must be per-__pid:\n$plan")
      assert(plan.contains("windowspecdefinition(grp"),
        s"group-rank window must be per-group:\n$plan")
      assert(!plan.contains("], true, 0"), s"no global sort anywhere:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"partition offsets must broadcast:\n$plan")
    }
  }

  test("AQE converts a statically-planned sort-merge join to broadcast at runtime") {
    // The 100 TB posture this proves: when the static planner cannot know a
    // side is small (estimates say shuffle), the ADAPTIVE planner re-plans
    // mid-query from real runtime stats — static broadcast disabled, adaptive
    // broadcast enabled, so only AQE can produce the BroadcastHashJoin.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
      conf.set("spark.sql.adaptive.enabled", "true")
      withTempDir { dir =>
        spark.range(20000).select(col("id"), (col("id") % 100).as("k"))
          .write.parquet(s"$dir/big")
        spark.range(100).select(col("id").as("k"), concat(lit("g"), col("id")).as("grp"))
          .write.parquet(s"$dir/small")
        val big = spark.read.parquet(s"$dir/big")
        val small = spark.read.parquet(s"$dir/small").filter(col("k") < 50)
        val joined = big.join(small, "k").groupBy("grp").count()
        val static = joined.queryExecution.executedPlan.toString
        assert(static.contains("SortMergeJoin") || static.contains("AdaptiveSparkPlan"),
          s"static plan should not broadcast (threshold -1):\n$static")
        assert(joined.collect().length === 50)
        val finalPlan = joined.queryExecution.executedPlan.toString
        assert(finalPlan.contains("BroadcastHashJoin"),
          s"AQE must have re-planned the join to broadcast from runtime stats:\n$finalPlan")
        assert(finalPlan.contains("isFinalPlan=true"),
          s"expected a finalized adaptive plan:\n$finalPlan")
      }
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("skipGramPmi: walk-keyed equi self-join, map-side-combined pair counts, no cartesian") {
    import spark.implicits._
    val walks = Seq((0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 3L),
      (1L, 0L, 2L), (1L, 1L, 3L)).toDF("walk_id", "step", "node")
    val p = graft.ext.Graph.skipGramPmi(walks, window = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the pair join must stay equi on walk_id:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"pair counts must combine map-side before their exchange:\n$p")
    // the only nested-loop join is the 1-row n_total broadcast
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("louvainContract: labels broadcast into both endpoint lookups, ONE (comm_a, comm_b) aggregate exchange") {
    import spark.implicits._
    val wed = Seq((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L), (2L, 10L, 1L),
      (10L, 11L, 2L), (10L, 10L, 3L)).toDF("a", "b", "w")
    val lab = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("node", "comm")
    val p = graft.ext.Graph.louvainContract(wed, lab)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"node-sized label table must broadcast into both endpoint lookups:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a label lookup must never sort-merge the edge table:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"the only shuffle is the contracted-edge weight aggregate:\n$p")
  }
}
