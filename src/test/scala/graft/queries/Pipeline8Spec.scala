package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_sample_weighted draws exactly 100 points, weighted by cents") {
    val rows = Pipeline8.queries("q_sample_weighted")(spark, dir).collect()
    val draws = rows.map(_.getLong(2))
    assert(draws.sum === 100L, s"systematic PPS must place all 100 points")
    assert(draws.forall(_ >= 1L))
    // Every drawn order's weight span must actually contain its points:
    // an order can be drawn at most ceil(w / step) + 1 times.
    val o = graft.Tables(spark, dir, "orders")
      .select(round($"o_totalprice" * 100).cast("long").as("w"))
    val tot = o.agg(sum($"w")).as[Long].head()
    val step = tot / 100.0
    rows.foreach { r =>
      val (w, n) = (r.getLong(1), r.getLong(2))
      assert(n <= math.ceil(w / step) + 1, s"order drawn $n times with w=$w step=$step")
    }
  }

  test("blocked prefix sum equals a single global window cumsum") {
    // The distributed scan (block offsets + within-block cumsum) must be
    // value-identical to the naive single-partition formulation.
    val o = graft.Tables(spark, dir, "orders").select(
      $"o_orderkey", round($"o_totalprice" * 100).cast("long").as("w"))
    val naive = o.withColumn("cum",
        sum($"w").over(Window.orderBy($"o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val blocked = o.withColumn("blk", expr("o_orderkey div 4096"))
    val offs = blocked.groupBy($"blk").agg(sum($"w").as("bsum"))
      .withColumn("off", coalesce(sum($"bsum").over(
        Window.orderBy($"blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val dist = blocked.join(offs.select($"blk", $"off"), Seq("blk"))
      .withColumn("cum", $"off" + sum($"w").over(
        Window.partitionBy($"blk").orderBy($"o_orderkey")))
      .select($"o_orderkey", $"w", $"cum")
    assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty)
  }

  test("q_twap: zero-length segments at tied timestamps contribute nothing") {
    // Crafted: user 1 has two events at the SAME instant with wildly
    // different values, then a third 10s later. The tied pair's first row
    // (by event_id) gets duration 0, so only the second value is held.
    val e = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1000.0),
      (2L, 1L, "2024-01-01 00:00:00", 2.0),
      (3L, 1L, "2024-01-01 00:00:10", 99.0)
    ).toDF("event_id", "user_id", "ts_s", "value")
      .select($"event_id", $"user_id", to_timestamp($"ts_s").as("ts"), $"value")
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val got = e.select($"user_id", $"event_id", unix_micros($"ts").as("us"), $"value")
      .withColumn("dur", lead($"us", 1).over(w) - $"us")
      .filter($"dur".isNotNull)
      .groupBy($"user_id")
      .agg((sum($"value" * $"dur") / sum($"dur")).as("twap"))
      .as[(Long, Double)].head()
    assert(got._2 === 2.0, "held value across the 10s gap must be 2.0, not 1000")
  }

  test("q_embed_pq: compressed-domain ranking recalls exact top-1 neighbors") {
    // Ground truth under the SAME metric ADC approximates: raw inner
    // product (cosine top-1 is a different ranking when norms vary).
    val e = graft.operators.Similarity.withNorm(
      graft.Tables(spark, dir, "embeddings"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"ip".desc, $"neighbor_id")
    val exact1 = e.as("q").filter($"q.vec_id" < 30)
      .join(e.as("c"), $"q.vec_id" =!= $"c.vec_id")
      .select($"q.vec_id".as("query_id"), $"c.vec_id".as("neighbor_id"),
        graft.functions.VectorFunctions.dot($"q.emb", $"c.emb").as("ip"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val pq = Pipeline8.queries("q_embed_pq")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact1.count { case (q, nn) => pq.getOrElse(q, Set()).contains(nn) }
    // These near-uniform synthetic embeddings are PQ's worst case (no
    // cluster structure → quantization error dominates); measured recall
    // across configs sits near 14/30, while a random 5-shortlist scores
    // ~0.3/30. The bound guards "ADC is silently broken", not marketing.
    assert(hits >= 10, s"recall@5 of exact top-1: $hits/30")
  }

  test("q_embed_pq ranking is partitioning-invariant") {
    val out1 = Pipeline8.queries("q_embed_pq")(spark, dir).collect()
    val e = graft.Tables(spark, dir, "embeddings").repartition(13)
    val out2 = graft.operators.Similarity.pqAdcKnn(
      graft.operators.Similarity.withNorm(e),
      m = 8, subDim = 8, ks = 16, iters = 1, nQueries = 30, k = 5).collect()
    assert(out1.toSeq === out2.toSeq)
  }

  test("q_sketch_rollup: merged per-source sketches equal the direct global sketch") {
    val k = 256
    val merged = Pipeline8.queries("q_sketch_rollup")(spark, dir)
      .filter($"source" === "__all__").select($"est_distinct")
      .as[Double].head()
    // Direct global KMV over the same hash space, no per-source stage.
    val hashes = graft.Tables(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("term"))
      .select(conv(substring(
        graft.functions.HashFunctions.md5fast($"term"), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct()
    val direct = hashes.orderBy($"h").limit(k)
      .agg(count(lit(1)).as("n"), max($"h").as("hk"))
      .select(when($"n" < k, $"n".cast("double"))
        .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
          $"hk".cast("double")))
      .as[Double].head()
    assert(merged === direct,
      "KMV union of per-source sketches must equal the sketch of the union")
  }

  test("q_embed_ivfpq: the probed-cell candidate space is a strict subset") {
    // The composite must score only candidates inside probed cells —
    // nprobe=2 of 16 cells ⇒ each query's candidate count well below the
    // corpus; and the ranking must still find real neighbors (overlap
    // with the full-ADC PQ ranking, which scans everything).
    val out = Pipeline8.queries("q_embed_ivfpq")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val byQuery = out.groupBy(_._1)
    assert(byQuery.size === 30 && out.length === 150)
    val fullPq = Pipeline8.queries("q_embed_pq")(spark, dir)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val overlap = out.count(fullPq.contains)
    // Identical scoring, pruned candidates: most composite picks should
    // also be in the full scan's top-5 (those that fall in probed cells).
    assert(overlap >= 60, s"composite diverged from full ADC: $overlap/150")
  }

  test("residual PQ beats raw PQ on ADC score fidelity (sf0.01)") {
    // Same IVF stage ⇒ IDENTICAL candidate sets; any difference is pure
    // quantization error. Residuals are centered with smaller spread
    // than raw vectors (measured E||r||² ≈ 0.905 vs E||x||² = 1 on this
    // corpus), so 16 codebook entries encode them more faithfully —
    // Jégou et al., PAMI 2011 §III. Fidelity is measured over ALL
    // scored pairs (k = ∞): a top-5-only comparison is selection-biased
    // toward pairs whose approximation happens to overshoot, which
    // rewards noisier codebooks.
    val d01 = "/root/testdata/sf0.01"
    val e = graft.operators.Similarity.withNorm(
      graft.Tables(spark, d01, "embeddings"))
    val raw = graft.operators.Similarity.ivfPqKnn(
      e, nCells = 16, cellIters = 1, m = 8, subDim = 8, ks = 16,
      pqIters = 1, nprobe = 2, nQueries = 30, k = Int.MaxValue).cache()
    val res = graft.operators.Similarity.ivfPqResidualKnn(
      e, nCells = 16, cellIters = 1, m = 8, subDim = 8, ks = 16,
      pqIters = 1, nprobe = 2, nQueries = 30, k = Int.MaxValue).cache()
    def meanErr(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val r = df.as("a")
        .join(e.as("q"), $"a.query_id" === $"q.vec_id")
        .join(e.as("c"), $"a.neighbor_id" === $"c.vec_id")
        .select(abs($"a.approx_dot" -
          graft.functions.VectorFunctions.dot($"q.emb", $"c.emb")).as("err"))
        .agg(avg($"err"), count(lit(1))).head()
      (r.getDouble(0), r.getLong(1))
    }
    val ((rawErr, rawN), (resErr, resN)) = (meanErr(raw), meanErr(res))
    assert(rawN === resN, "shared IVF stage must yield identical candidate sets")
    // Measured on this corpus: raw ≈ 0.083, residual ≈ 0.068 (−18%).
    // Gate at 5% so data regeneration noise can't flap the test.
    assert(resErr < rawErr * 0.95,
      f"residual ADC must approximate dots better: $resErr%.4f vs $rawErr%.4f over $rawN pairs")
    // Recall floor: top-5 of each must still find exact IP top-1s at the
    // rate the probed-cell ceiling allows (~1/3 of queries here); this
    // guards "residual path silently broken", not a marketing number.
    val w = Window.partitionBy($"query_id").orderBy($"ip".desc, $"neighbor_id")
    val exact1 = e.as("q").filter($"q.vec_id" < 30)
      .join(e.as("c"), $"q.vec_id" =!= $"c.vec_id")
      .select($"q.vec_id".as("query_id"), $"c.vec_id".as("neighbor_id"),
        graft.functions.VectorFunctions.dot($"q.emb", $"c.emb").as("ip"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val resTop5 = res.filter($"rk" <= 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val resHits = exact1.count { case (q, nn) =>
      resTop5.getOrElse(q, Set()).contains(nn) }
    assert(resHits >= 6, s"residual recall@5 collapsed: $resHits/30")
    raw.unpersist(); res.unpersist()
  }

  test("multi-probe LSH recalls at least as much as single-bucket LSH") {
    val e = graft.operators.Similarity.withNorm(
      graft.Tables(spark, dir, "embeddings"))
    val exact = graft.operators.Similarity
      .bruteForceKnn(e.filter($"vec_id" < 30), e, 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    def recall(df: org.apache.spark.sql.DataFrame): Int = {
      val got = df.select($"query_id", $"neighbor_id").as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.count { case (q, nn) => got.getOrElse(q, Set()).contains(nn) }
    }
    val single = recall(graft.operators.Similarity.annLshKnn(e, k = 5)
      .filter($"query_id" < 30))
    val multi = recall(graft.operators.Similarity
      .annMultiProbeKnn(e, k = 5, bits = 8, nQueries = 30))
    assert(multi >= single,
      s"multi-probe must not lose recall: $multi vs $single (of 30)")
    // Absolute recall is data-limited: 9 of 256 buckets ≈ 3.5% of a
    // near-uniform corpus per query, so single-digit hits out of 30 is
    // the honest ceiling here (random 5-shortlists score ~0.3). The
    // bound guards "probing is broken", the inequality above guards the
    // actual multi-probe property.
    assert(multi >= 2, s"multi-probe recall@5 below chance: $multi/30")
  }

  test("q_variant extracts typed paths equal to the string-JSON path") {
    val out = Pipeline8.queries("q_variant")(spark, dir)
    val viaString = graft.Tables(spark, dir, "events")
      .select($"event_id", get_json_object($"props", "$.k").cast("long").as("k_val"))
    val mismatch = out.select($"event_id", $"k_val").except(viaString)
    assert(mismatch.isEmpty)
    assert(out.filter($"etype_rt".isNull).count() === 0)
    assert(out.select($"vschema").distinct().count() === 1)
  }
}
