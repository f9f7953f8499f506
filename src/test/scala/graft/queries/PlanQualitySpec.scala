package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{ExplainAudit, SparkEntry, TestSpark}

/** Physical-plan assertions for the headline queries — the properties
  * that decide whether these plans survive a 100 TB scale-up. A green
  * correctness run with a bad plan (full-schema scans, shuffled dims,
  * interpreted hot loops) is a silent regression; these tests fail it.
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q1_agg: column pruning reaches the lineitem scan") {
    val p = plan("q1_agg")
    // lineitem has 16 columns; the scan must read only the 5 used ones.
    val readSchema = "ReadSchema: struct<" +
      "l_quantity:double,l_extendedprice:double,l_discount:double," +
      "l_returnflag:string,l_linestatus:string"
    assert(p.contains("l_quantity"), p)
    assert(!p.contains("l_shipdate"), "unused column not pruned from scan")
    assert(p.replaceAll("\\s", "").contains(
      readSchema.replaceAll("\\s", "").take(40)), p)
  }

  test("q1_agg: filter is pushed down to the parquet reader") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,45.0)]"), p)
  }

  test("q1_agg: aggregation is partial+final (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length >= 3, // partial + final
      "expected two-phase hash aggregation\n" + p)
  }

  test("q_join_nation_rev: dimension joins broadcast, no dim shuffle") {
    val p = plan("q_join_nation_rev")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_sort_limit: sort+limit fuses to TakeOrderedAndProject (top-k)") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_embed_ann_lsh: hot-bucket cap and salt are in the gated plan") {
    // Round-8 skew fix: one bucket holding 25% of vectors made the
    // bucket-keyed join a single-task straggler (14.3× wall, flat CPU).
    // The gated plan must keep BOTH guards: the candidate-side bucket
    // cap (row_number window over bucket) and the salt spread (pmod of
    // hash on the query side, explode on the candidate side).
    val p = plan("q_embed_ann_lsh")
    assert(p.contains("__salt"), "salt columns missing from plan\n" + p)
    assert(p.toLowerCase.contains("explode"),
      "candidate-side salt explode missing\n" + p)
    // Since round 8, topK() plans the graft_topk aggregate (no window
    // at all), so the ONLY window in this plan is the bucket cap — pin
    // it by its own column name (`__bp`, the per-bucket rank that
    // `.filter(__bp <= maxBucket)` consumes): it appears iff maxBucket
    // is set.
    assert(p.contains("__bp"), "bucket-cap (__bp rank) missing from plan\n" + p)
  }

  test("q_nearest_centroid: window ranks a pruned stream, not the embeddings") {
    // Round-9 rank audit's load-bearing fact: columns used only to
    // COMPUTE a window's sort key are pruned out of the Window's child
    // by Catalyst, so the per-partition sort never buffers them. Here
    // the score is a dot over two 64-dim arrays — the ranked stream
    // must carry neither.
    val qe = SparkEntry.queries("q_nearest_centroid")(spark, dir).queryExecution
    val windows = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, qe.optimizedPlan.toString)
    windows.foreach { w =>
      // Assert on TYPE, not name substrings: what must never sit under
      // the window's per-partition sort is any array payload (the
      // 64-dim vectors) — a name check like contains("emb") would also
      // trip on an unrelated rename (e.g. "member"; round-9 advice).
      val arrayCols = w.child.output.collect {
        case a if a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
          a.name
      }
      assert(arrayCols.isEmpty,
        s"array payload survived under the window: $arrayCols")
    }
  }

  test("headline aggregation runs inside WholeStageCodegen") {
    // AQE finalizes the physical plan lazily — execute, then inspect.
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string.
    assert(p.contains("*(") && p.contains("HashAggregate"), p)
  }

  test("q_embed_knn: custom dot-product expression stays codegen'd, top-k is partial+final") {
    val df = SparkEntry.queries("q_embed_knn")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p)
    assert(p.contains("graft_dot"), p)
    // Since round 8 the per-query top-k is graft_topk (BoundedTopK, a
    // TypedImperativeAggregate): the map side emits at most k rows per
    // (query × partition) — strictly better than the previous
    // row_number()/WindowGroupLimit shape, whose PARTIAL stage still
    // sorted the whole candidate-pair stream per partition (the last
    // ×100-scale spill). Pin the aggregate and the absence of any
    // window over the pair stream.
    assert(p.contains("graft_topk"), p)
    assert(!p.contains("WindowGroupLimit") && !p.contains("RunningWindowFunction"), p)
  }

  test("q_doc_sim_cosine: candidate generation is equi-join only, no cartesian") {
    val p = plan("q_doc_sim_cosine")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q_tfidf_topterms: corpus-size side broadcasts; per-doc top-k is WindowGroupLimit") {
    val df = SparkEntry.queries("q_tfidf_topterms")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 1-row count must broadcast (never shuffle the term table against it)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q_sample_stratified: single shuffle keyed on the stratum") {
    val df = SparkEntry.queries("q_sample_stratified")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // one hash exchange for the window partitioning + the final orderBy's
    // range exchange — nothing else
    assert(p.split("Exchange hash|Exchange range").length <= 3, p)
    // the partial WindowGroupLimit keeps ≤20 rows per partition BEFORE
    // the shuffle — the reservoir-sample shape at scale
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p)
  }

  test("q_gapfill: calendar side stays tiny, daily agg is partial+final") {
    val p = plan("q_gapfill")
    assert(p.contains("HashAggregate"), p)
    assert(p.split("HashAggregate").length >= 3, p)
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "calendar cross join must broadcast, not shuffle-cartesian\n" + p)
  }

  test("q_dedup_bloom: bloom screen is a pre-shuffle filter, verify join is hash-based") {
    val p = plan("q_dedup_bloom")
    // the probe predicate must exist (the screen actually happens)...
    assert(p.contains("might_contain"), p)
    // ...and feed a hash semi join, never a nested loop
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the screen runs map-side: the filter appears before the first
    // exchange of its branch, i.e. somewhere below an Exchange in the text
    val probeIdx = p.indexOf("might_contain")
    assert(p.lastIndexOf("Exchange", probeIdx) >= 0 || !p.contains("Exchange"),
      "bloom screen should sit under the shuffle, not above it\n" + p)
  }

  test("q_decontaminate: eval shingles broadcast; train side never shuffles for the join") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_passage_dedup: hash-keyed window, no nested loops") {
    val p = plan("q_passage_dedup")
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_mix_budget: one hash shuffle on source feeds the running-sum window") {
    val p = plan("q_mix_budget")
    assert(p.contains("Window"), p)
    // hash exchange for the window partition + range exchange for the
    // final orderBy — nothing else
    assert(p.split("Exchange hash|Exchange range").length <= 3, p)
  }

  test("q_kanon: QI group sizes broadcast back; agg is partial+final") {
    val p = plan("q_kanon")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.split("HashAggregate").length >= 3, p)
  }

  test("q_vocab_topk: two-phase count then top-k fusion, no global sort") {
    val p = plan("q_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.split("HashAggregate").length >= 3, p)
  }

  test("q_profile: all column stats come from ONE scan of lineitem") {
    val p = plan("q_profile")
    // multi-column exact distinct plans via Expand over a single scan,
    // never one scan per profiled column
    assert(p.split("Scan parquet").length == 2, s"expected exactly one scan\n$p")
    assert(p.contains("Expand"), p)
  }

  test("q_asof_join and variants plan with no join node (union+window sweep)") {
    for (q <- Seq("q_asof_join", "q_asof_tolerance", "q_asof_forward", "q_asof_nearest")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q should be join-free\n$p")
      assert(p.contains("Window"), s"$q should sweep via window\n$p")
    }
  }

  test("q_tpch3/q_tpch10: top-N fuses to TakeOrderedAndProject") {
    for (q <- Seq("q_tpch3", "q_tpch10")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q global-sorts\n$p")
    }
  }

  test("q_tpch5: nation and region broadcast; date filter reaches scan") {
    val p = plan("q_tpch5")
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"expected ≥2 broadcast joins (nation, region)\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("q_tpch6: pure-scan aggregate — all predicates pushed, no join, no wide shuffle") {
    val p = plan("q_tpch6")
    assert(!p.contains("Join"), s"Q6 must be join-free\n$p")
    // The plan printer truncates long PushedFilters lists; match the
    // stable prefix that proves the shipdate predicate reached the scan.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"date predicate not pushed to parquet\n$p")
    // Only the 1-row partial→final aggregate exchange is allowed.
    assert(p.split("Exchange").length <= 2, s"unexpected shuffle in Q6\n$p")
  }

  test("TPC-H suite: dims broadcast, no cartesian fact joins") {
    // BroadcastNestedLoopJoin is legal ONLY for the 1-row scalar-subquery
    // broadcasts (q_tpch22's global average); everything else must plan
    // as hash joins with the dimension side broadcast.
    for (q <- Seq("q_tpch2", "q_tpch7", "q_tpch8", "q_tpch9", "q_tpch14",
        "q_tpch16", "q_tpch19", "q_tpch20")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$p")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a BNLJ\n$p")
    }
  }

  test("q_tpch18: having prunes before the customer join; top-N fuses") {
    val p = plan("q_tpch18")
    assert(p.contains("TakeOrderedAndProject"), s"Q18 global-sorts\n$p")
    // The sum_qty > 190 filter must sit on the aggregate, upstream of the
    // orders join — only qualifying orders reach the join.
    val aggIdx = p.indexOf("HashAggregate")
    val filterIdx = p.indexOf("(sum_qty")
    assert(filterIdx >= 0 && aggIdx >= 0, s"missing having filter\n$p")
  }

  test("q_tpch2/q_tpch17: single lineitem scan (window, not agg+self-join)") {
    for (q <- Seq("q_tpch2", "q_tpch17")) {
      val p = plan(q)
      val lineitemScans = "Scan parquet".r.findAllIn(p).size
      // q_tpch2 scans lineitem+part+supplier+nation+region = 5 sources;
      // q_tpch17 scans lineitem+part = 2. Either way lineitem appears once.
      assert("lineitem\\.parquet".r.findAllIn(p).size <= 1,
        s"$q re-scans lineitem ($lineitemScans scans)\n$p")
      assert(p.contains("Window"), s"$q lost its window formulation\n$p")
    }
  }

  test("fused order statistics: survival and drawdown pay ONE exchange each") {
    // Round 5 chained two OrderStats.running calls (= two range shuffles
    // + two checkpoints) in each of these; round 6 fuses both directions,
    // the running-max-of-running-sum, and the chained hazard cumulative
    // into one call. The output DataFrame starts from the checkpointed
    // RDD, so the exchange is invisible to executedPlan — the invocation
    // counter (1 invocation == 1 exchange) is the honest gate.
    for (q <- Seq("q_survival_hazard", "q_max_drawdown")) {
      val before = graft.operators.OrderStats.invocations.get
      assert(SparkEntry.queries(q)(spark, dir).collect().nonEmpty, q)
      assert(graft.operators.OrderStats.invocations.get - before == 1,
        s"$q should fuse to exactly one OrderStats exchange")
    }
  }

  test("q_heavy_hitters: candidate semi-join broadcasts; recount is two-phase") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      "candidate screen must be a broadcast semi join\n" + p)
    assert(p.split("HashAggregate").length >= 3,
      "exact recount must be partial+final\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_interval_join: binned overlap is an equi-join, no nested loop") {
    val p = plan("q_interval_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("q_range_join_auto: the optimizer rule bins the plain non-equi join") {
    // Written as a bare lo <= p AND p < hi join — the plan is equi only
    // because plans/RangeBinRule rewrote it during optimization.
    val p = plan("q_range_join_auto")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
    assert(p.contains("__graft_p_bucket"),
      s"expected the RangeBinRule bucket column in the plan:\n$p")
  }

  test("q_sample_weighted: per-block cumsum windows are partitioned") {
    val p = plan("q_sample_weighted")
    // The within-block window must be keyed (parallel); only the tiny
    // block-offset window may be global — if no window spec partitions
    // by blk, the prefix sum degenerated to single-partition.
    assert(p.contains("Window"), p)
    val specs = "windowspecdefinition\\([^)]*\\)".r.findAllIn(p).toSeq
    assert(specs.exists(_.contains("blk#")),
      "row cumsum must partition by blk\n" + specs.mkString("\n"))
  }

  test("q_embed_pq: ADC lookup joins broadcast; no unbounded nested loop") {
    val p = plan("q_embed_pq")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  private def bnljClasses(q: String): Seq[ExplainAudit.BnljClass] = {
    val physical = SparkEntry.queries(q)(spark, dir)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    physical.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        ExplainAudit.classify(j, physical)
    }
  }

  test("IVF centroid-assignment BNLJs classify bounded, never real") {
    // assignCells joins N vectors against a broadcast of <= nCells
    // centroid rows with no equi-key — an N×k pass with k bounded, the
    // correct k-means assignment plan. The audit must report it as
    // boundedBnlj so bnlj=true stays a zero-tolerance signal.
    for (q <- Seq("q_embed_ivf", "q_embed_ivfpq", "q_embed_ivfpq_res")) {
      val cls = bnljClasses(q)
      assert(cls.nonEmpty, s"$q: expected centroid-assignment BNLJs")
      assert(!cls.contains(ExplainAudit.RealBnlj),
        s"$q: bounded centroid assignment misclassified as real BNLJ")
      assert(cls.contains(ExplainAudit.BoundedBnlj), s"$q: $cls")
    }
  }

  test("batch 10-12 additions: equi-joins and bounded broadcasts only") {
    // BPE learning/encoding cross-joins 1-row argmax frames — every BNLJ
    // must classify bounded (or scalar), never real.
    for (q <- Seq("q_bpe_learn", "q_bpe_encode", "q_bpe_doc_tokens")) {
      val cls = bnljClasses(q)
      assert(!cls.contains(ExplainAudit.RealBnlj), s"$q: $cls")
    }
    // Wedge join + anti-join adjacency screen must stay hash-based.
    val cn = plan("q_common_neighbors")
    assert(!cn.contains("BroadcastNestedLoopJoin") && !cn.contains("CartesianProduct"), cn)
    assert(cn.contains("LeftAnti"), "adjacency exclusion must be an anti join\n" + cn)
    // Per-dimension quantization stats broadcast back into the value stream.
    val sq = plan("q_embed_sq8")
    assert(sq.contains("BroadcastHashJoin"), sq)
    // Contrastive sampling: label-pair frame broadcasts; no nested loop
    // reaches the corpus side.
    val cp = plan("q_contrastive_pairs")
    assert(!cp.contains("CartesianProduct"), cp)
    assert(bnljClasses("q_contrastive_pairs")
      .forall(_ != ExplainAudit.RealBnlj), "label-pair join must stay bounded")
    // Weighted median: pre-aggregation is two-phase, windows are keyed.
    val wm = plan("q_weighted_median")
    assert(wm.split("HashAggregate").length >= 3, wm)
    assert(wm.contains("Window"), wm)
  }

  test("a genuinely unbounded nested loop still classifies real") {
    import org.apache.spark.sql.functions._
    val a = graft.Tables(spark, dir, "orders").select(col("o_orderkey"))
    val b = graft.Tables(spark, dir, "customer").select(col("c_custkey"))
    val physical = a.join(b, col("o_orderkey") < col("c_custkey"))
      .queryExecution.executedPlan match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        ad.executedPlan
      case p => p
    }
    val cls = physical.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        ExplainAudit.classify(j, physical)
    }
    assert(cls.contains(ExplainAudit.RealBnlj), s"unbounded join hidden: $cls")
  }

  test("a scalar re-expanded by explode classifies real, not scalar") {
    // The old isScalar used an unrestricted subtree find: ANY no-key
    // aggregate below the build root passed, so explode(agg) — which can
    // multiply rows without bound — audited as harmless. The walk-down
    // must stop at the generator.
    import org.apache.spark.sql.functions._
    val a = graft.Tables(spark, dir, "orders").select(col("o_orderkey"))
    val build = graft.Tables(spark, dir, "lineitem")
      .agg(collect_list(col("l_orderkey")).as("ks"))
      .select(explode(col("ks")).as("k")) // no-key agg, then re-expanded
    val physical = a.join(build, col("o_orderkey") < col("k"))
      .queryExecution.executedPlan match {
      case ad: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        ad.executedPlan
      case p => p
    }
    val cls = physical.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        ExplainAudit.classify(j, physical)
    }
    assert(cls.nonEmpty && cls.forall(_ == ExplainAudit.RealBnlj),
      s"explode-above-scalar must classify real: $cls")
  }

  test("batch 27-28 additions: bounded brute force, hash joins, one OrderStats pass") {
    // q_ann_recall's exact baseline is the intentional probe-bounded
    // nested loop (the q_embed_knn shape: <=200 broadcast probes x N);
    // the LSH pass must be an equi-join on the bucket, never a second
    // nested loop.
    val ar = plan("q_ann_recall")
    assert(ar.contains("BroadcastHashJoin"),
      "LSH candidate generation must be a bucket equi-join\n" + ar)
    assert(ar.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      "only the exact baseline may nested-loop\n" + ar)
    assert(!ar.contains("CartesianProduct"), ar)
    // Assortativity joins degree frames by key — hash joins only.
    val ga = plan("q_graph_assortativity")
    assert(!ga.contains("BroadcastNestedLoopJoin") || bnljClasses(
      "q_graph_assortativity").forall(_ != ExplainAudit.RealBnlj), ga)
    assert(!ga.contains("CartesianProduct"), ga)
    // Compressibility audit: the lag window is partitioned by order key.
    val ce = plan("q_compress_estimate")
    assert(ce.contains("Window"), ce)
    assert(!ce.contains("Window [") ||
      !ce.replaceAll("\\s", "").contains("windowspecdefinition()"), ce)
    // One OrderStats exchange per prefix-sum query in the new batches.
    for (q <- Seq("q_changepoint_bss", "q_concurrency_peak", "q_bh_fdr")) {
      val before = graft.operators.OrderStats.invocations.get
      assert(SparkEntry.queries(q)(spark, dir).collect().nonEmpty, q)
      assert(graft.operators.OrderStats.invocations.get - before == 1,
        s"$q should pay exactly one OrderStats exchange")
    }
  }

  test("batch 31 additions: every nested loop classifies bounded or scalar") {
    // q_ndcg_retrieval's exact ranking is the probe-bounded brute force
    // (explicit limit(300) roots the build at a static bound);
    // q_heaps_law and q_psi_drift broadcast 10-row/statically-bounded
    // grids (range × scalar — the recursive-BNLJ classifier case);
    // q_runs_test's median is a scalar-aggregate build.
    for (q <- Seq("q_psi_drift", "q_runs_test", "q_wasserstein_lengths",
        "q_heaps_law", "q_ndcg_retrieval", "q_hurst_rs")) {
      val cls = bnljClasses(q)
      assert(!cls.contains(ExplainAudit.RealBnlj), s"$q: $cls")
    }
    // Hurst's per-segment windows must all be keyed by (w, seg).
    val hr = plan("q_hurst_rs")
    assert(!hr.replaceAll("\\s", "").contains("windowspecdefinition()"), hr)
    // ANOVA is scan → partial/final agg → scalar: no joins at all.
    val af = plan("q_anova_f")
    assert(!af.contains("Join"), af)
  }
}
