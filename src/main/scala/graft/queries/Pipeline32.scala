package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Ckpt.CkptOps
import graft.operators.{Dedup, OrderStats, Similarity}
import Qs._

/** Thirty-second batch: retrieval/graph/extreme-value diagnostics — MRR
  * of the exact retrieval ranking, Kendall tau-b between the daily
  * revenue and order-count series, brand-partition modularity of the
  * co-purchase graph, the Hill tail-index estimator, Gumbel block-maxima
  * moments, month-over-month top-k turnover, and Chao1 unseen-shingle
  * richness.
  *
  * Scale design notes (100 TB):
  *  - q_mrr reuses the probe-bounded brute-force ranking (≤300 broadcast
  *    probes × N corpus) and reduces to per-label scalars.
  *  - q_kendall_daily self-joins the per-day aggregate — the pair space
  *    is calendar², a constant in data volume, and every count is an
  *    exact long.
  *  - q_modularity needs only three keyed aggregates over the edge list
  *    (total, intra-community, per-community degree mass) — no per-pair
  *    community work; the part→brand map joins by key.
  *  - q_hill_tail ranks via OrderStats.topK (per-partition top-k +
  *    bounded merge, never a global sort) and pays log terms for 500
  *    rows only.
  *  - q_block_maxima / q_topk_turnover group to calendar-bounded frames
  *    first; the turnover join is top-10 × top-10 per month pair.
  *  - q_chao1_richness is one groupBy over shingles + a 3-way conditional
  *    count — the frequency-of-frequencies sketch at full scale.
  */
object Pipeline32 {

  val queries: Map[String, Q] = Map(
    // Mean reciprocal rank @10 per label: how high does the first
    // same-label neighbor rank in the exact cosine ordering? Probes with
    // no hit in the top-10 contribute 0.
    "q_mrr" -> { (s, dir) =>
      val e = Similarity.withNorm(t(s, dir, "embeddings"))
      val lbl = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"))
      val knn = Similarity.bruteForceKnn(
        e.filter(col("vec_id") < 300).limit(300), e, k = 10)
      val hits = knn
        .join(lbl.select(col("vec_id").as("query_id"), col("label").as("ql")),
          Seq("query_id"))
        .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nl")),
          Seq("neighbor_id"))
        .filter(col("ql") === col("nl"))
        .groupBy(col("query_id")).agg(min(col("rk")).as("fr"))
      lbl.filter(col("vec_id") < 300)
        .select(col("vec_id").as("query_id"), col("label"))
        .join(hits, Seq("query_id"), "left")
        .withColumn("rr", coalesce(
          (lit(1.0) / col("fr").cast("double")).cast(DecimalType(18, 10)),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 10))))
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          count(col("fr")).cast("long").as("n_hit"),
          (sum(col("rr")).cast("double") / count(lit(1)).cast("double"))
            .as("mrr"))
        .orderBy(col("label"))
    },

    // Kendall tau-b between daily revenue and daily order count:
    // concordant/discordant/tied pair counts over the calendar-bounded
    // per-day frame, all exact integers until the final ratio.
    "q_kendall_daily" -> { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").as("day"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"),
          count(lit(1)).cast("long").as("n_orders"))
      val pairs = daily.as("a")
        .join(daily.as("b"), col("a.day") < col("b.day"))
        .select(
          ((col("a.cents") - col("b.cents")) > 0).as("xgt"),
          ((col("a.cents") - col("b.cents")) < 0).as("xlt"),
          ((col("a.n_orders") - col("b.n_orders")) > 0).as("ygt"),
          ((col("a.n_orders") - col("b.n_orders")) < 0).as("ylt"))
      val cnt = pairs.agg(
        count(lit(1)).cast("long").as("n_pairs"),
        sum(when((col("xgt") && col("ygt")) || (col("xlt") && col("ylt")), 1L)
          .otherwise(0L)).cast("long").as("concordant"),
        sum(when((col("xgt") && col("ylt")) || (col("xlt") && col("ygt")), 1L)
          .otherwise(0L)).cast("long").as("discordant"),
        sum(when(!col("xgt") && !col("xlt"), 1L).otherwise(0L))
          .cast("long").as("tie_x"),
        sum(when(!col("ygt") && !col("ylt"), 1L).otherwise(0L))
          .cast("long").as("tie_y"))
      cnt
        .withColumn("tau_b",
          (col("concordant") - col("discordant")).cast("double") /
            sqrt((dec(col("n_pairs") - col("tie_x"), 38, 0) *
              dec(col("n_pairs") - col("tie_y"), 38, 0)).cast("double")))
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          col("tie_x"), col("tie_y"), col("tau_b"))
    },

    // Newman modularity of the part co-purchase graph under the p_brand
    // partition: Q = Σ_c (E_c/E − (D_c/E)²) over directed symmetric
    // edges. How much more intra-brand co-purchasing than a random
    // degree-preserving rewiring would produce.
    "q_modularity" -> { (s, dir) =>
      // Brands are attached BEFORE the pair explosion (round-10 ×1000
      // finding): tagging the DEDUPED edge set by joining on src and
      // then dst re-shuffles the data-sized pair stream twice more — at
      // the ×1000 corpus the three pair-stream exchanges (dedup + two
      // brand joins, ~25 GB each) all live in one job's lineage, cannot
      // be GC'd mid-job, and exhausted the scratch disk. Tagging the
      // (order, part) rows first costs one narrow lineitem-sized join;
      // the pair rows then carry the two 8-char brand strings and the
      // only pair-sized exchange left is the DEDUP itself. cs/cd ride
      // the dedup as max() — each is a function of src/dst, so the
      // per-group value is unique and max() is exact, not a choice.
      val brands = t(s, dir, "part")
        .select(col("p_partkey").as("pk"), col("p_brand"))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .join(brands, Seq("pk"))
      // Shared degree cap (Pipeline12.cappedOrderSets): the struct sorts
      // by (pk, p_brand) — pk leads, and pk → brand is functional, so
      // the truncation keeps the 1000 smallest partkeys per order; the
      // oracle mirrors it with ROW_NUMBER ordered the same way.
      val tagged = Pipeline12.cappedOrderSets(li, col("ok"),
          struct(col("pk"), col("p_brand")))
        .select(explode(col("items")).as("a"), col("items"))
        .select(col("a"), explode(col("items")).as("b"))
        .filter(col("a.pk") =!= col("b.pk"))
        .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
        .agg(max(col("a.p_brand")).as("cs"), max(col("b.p_brand")).as("cd"))
      // ONE pass over the tagged edge stream: the community frame is
      // ≤ #brands rows and checkpointed, and the global edge count
      // derives from it (Σ per-community degree_sum ≡ count(*) — same
      // value, zero extra scan). The previous shape computed `total`
      // as a SECOND full-edge aggregation INSIDE the broadcast thread,
      // which both doubled the scan and hit spark.sql.broadcastTimeout
      // (default 300 s) at the ×1000 corpus, where one edge pass alone
      // runs minutes — a broadcast's child must be cheap-to-compute,
      // not just small. (Round-10 ×1000 finding.)
      val byComm = tagged.groupBy(col("cs").as("community"))
        .agg(count(lit(1)).cast("long").as("degree_sum"),
          countDistinct(col("src")).cast("long").as("n_nodes"),
          sum(when(col("cs") === col("cd"), 1L).otherwise(0L))
            .cast("long").as("intra_edges"))
        .ckpt()
      val total = byComm.agg(sum(col("degree_sum")).cast("long").as("e_all"))
      val terms = byComm.crossJoin(broadcast(total))
        .withColumn("contribution",
          (col("intra_edges").cast("double") / col("e_all").cast("double") -
            (col("degree_sum").cast("double") / col("e_all").cast("double")) *
            (col("degree_sum").cast("double") / col("e_all").cast("double")))
            .cast(DecimalType(18, 10)))
      val q = terms.agg(sum(col("contribution")).cast("double").as("modularity"))
      terms
        .crossJoin(broadcast(q))
        .select(col("community"), col("n_nodes"), col("intra_edges"),
          col("degree_sum"), col("contribution").cast("double").as("contribution"),
          col("modularity"))
        .orderBy(col("community"))
    },

    // Hill estimator of the right tail index of order totals: mean log
    // excess of the top-500 order statistics over the 501st, and the
    // implied Pareto alpha. Ranking via per-partition top-k, not a
    // global sort.
    "q_hill_tail" -> { (s, dir) =>
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"))
      val top = OrderStats.topK(o, Seq(col("cents").desc, col("o_orderkey")),
        501, "rk")
      val ref = top.agg(max(when(col("rk") === 501, col("cents"))).as("x_ref"))
      val terms = top.filter(col("rk") <= 500).crossJoin(broadcast(ref))
        .select(col("x_ref"),
          log(col("cents").cast("double") / col("x_ref").cast("double"))
            .cast(DecimalType(18, 10)).as("lr"))
      terms.groupBy(col("x_ref"))
        .agg(count(lit(1)).cast("long").as("k_top"),
          (sum(col("lr")).cast("double") / count(lit(1)).cast("double"))
            .as("hill_mean"))
        .withColumn("tail_alpha", lit(1.0) / col("hill_mean"))
        .select(col("k_top"), col("x_ref"), col("hill_mean"), col("tail_alpha"))
    },

    // Gumbel fit of monthly block maxima of daily revenue by the method
    // of moments: β = s√6/π, μ = x̄ − γβ. The extreme-value capacity
    // planner's first sketch, from exact decimal moments.
    "q_block_maxima" -> { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"), col("o_orderdate"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("cents"))
      val mx = daily.groupBy(col("m")).agg(max(col("cents")).as("mx"))
      // Monthly-max-cents squares pass ~2^63 at sf1 — mirrored hi/lo
      // conversion (round-7 sweep class).
      mx.agg(count(lit(1)).cast("long").as("n_months"),
          sum(dec(col("mx"), 38, 0)).cast("double").as("sx"),
          sum(dec(col("mx"), 38, 0) * dec(col("mx"), 38, 0)).as("sxx0"))
        .withColumn("sxx", dblBig("sxx0"))
        .withColumn("mean_max", col("sx") / col("n_months").cast("double"))
        .withColumn("sd_max", sqrt(
          (col("sxx") - col("sx") * col("sx") / col("n_months").cast("double")) /
            (col("n_months") - 1).cast("double")))
        .withColumn("gumbel_beta", col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi))
        .withColumn("gumbel_mu",
          col("mean_max") - lit(0.5772156649015329) * col("gumbel_beta"))
        .select(col("n_months"), col("mean_max"), col("sd_max"),
          col("gumbel_beta"), col("gumbel_mu"))
    },

    // Month-over-month turnover of the top-10 parts by shipped revenue:
    // set intersection and Jaccard between consecutive months' top lists
    // — the "how stable is my head" merchandising diagnostic.
    "q_topk_turnover" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .groupBy((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("m"), col("l_partkey"))
        .agg(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
          .as("cents"))
      val byMonth = Window.partitionBy(col("m"))
        .orderBy(col("cents").desc, col("l_partkey"))
      val top = rev.withColumn("rk", row_number().over(byMonth))
        .filter(col("rk") <= 10)
        .select(col("m"), col("l_partkey"))
      val sizes = top.groupBy(col("m")).agg(count(lit(1)).cast("long").as("k"))
      val common = top.as("a")
        .join(top.as("b"), col("b.m") === col("a.m") + 1 &&
          col("b.l_partkey") === col("a.l_partkey"))
        .groupBy(col("a.m").as("m"))
        .agg(count(lit(1)).cast("long").as("n_common"))
      sizes.as("sa")
        .join(sizes.as("sb"), col("sb.m") === col("sa.m") + 1)
        .select(col("sa.m").as("month_a"), col("sb.m").as("month_b"),
          col("sa.k").as("k_a"), col("sb.k").as("k_b"))
        .join(common.withColumnRenamed("m", "month_a"), Seq("month_a"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("k_a") + col("k_b") - col("n_common")).cast("double"))
        .select(col("month_a"), col("month_b"), col("k_a"), col("k_b"),
          col("n_common"), col("jaccard"))
        .orderBy(col("month_a"))
    },

    // Chao1 richness: lower-bound estimate of the TRUE distinct-shingle
    // count from the observed frequency-of-frequencies (bias-corrected
    // form, defined even when no shingle occurs exactly twice). How much
    // vocabulary the corpus hasn't shown yet.
    "q_chao1_richness" -> { (s, dir) =>
      val df = Dedup.shingles(t(s, dir, "documents"))
        .groupBy(col("shingle")).agg(count(lit(1)).cast("long").as("c"))
      df.agg(count(lit(1)).cast("long").as("v_obs"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).cast("long").as("f2"))
        .withColumn("chao1", col("v_obs").cast("double") +
          col("f1").cast("double") * (col("f1") - 1).cast("double") /
            (lit(2.0) * (col("f2") + 1).cast("double")))
        .select(col("v_obs"), col("f1"), col("f2"), col("chao1"))
    })

  val oracle: Map[String, String] = Map(
    "q_mrr" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
        |      CAST(embedding AS DOUBLE[]))) AS nrm,
        |    CAST(label AS BIGINT) AS label
        |  FROM embeddings),
        |knn AS (SELECT query_id, neighbor_id, rk FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_inner_product(q.emb, c.emb) / (q.nrm * c.nrm) DESC,
        |      c.vec_id) AS BIGINT) AS rk
        |  FROM e q JOIN e c ON q.vec_id <> c.vec_id WHERE q.vec_id < 300) t
        |  WHERE rk <= 10),
        |hits AS (SELECT knn.query_id, MIN(rk) AS fr
        |  FROM knn JOIN e ql ON ql.vec_id = knn.query_id
        |    JOIN e nl ON nl.vec_id = knn.neighbor_id
        |  WHERE ql.label = nl.label GROUP BY 1),
        |p AS (SELECT e.vec_id AS query_id, e.label, hits.fr,
        |    COALESCE(CAST(CAST(1 AS DOUBLE) / CAST(hits.fr AS DOUBLE)
        |      AS DECIMAL(18,10)), CAST(0 AS DECIMAL(18,10))) AS rr
        |  FROM e LEFT JOIN hits ON hits.query_id = e.vec_id
        |  WHERE e.vec_id < 300)
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(COUNT(fr) AS BIGINT) AS n_hit,
        |  CAST(SUM(rr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mrr
        |FROM p GROUP BY label ORDER BY label""".stripMargin,
    "q_kendall_daily" ->
      """WITH d AS (SELECT o_orderdate AS day,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |p AS (SELECT a.cents > b.cents AS xgt, a.cents < b.cents AS xlt,
        |    a.n_orders > b.n_orders AS ygt, a.n_orders < b.n_orders AS ylt
        |  FROM d a JOIN d b ON a.day < b.day),
        |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN (xgt AND ygt) OR (xlt AND ylt) THEN 1
        |      ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(SUM(CASE WHEN (xgt AND ylt) OR (xlt AND ygt) THEN 1
        |      ELSE 0 END) AS BIGINT) AS discordant,
        |    CAST(SUM(CASE WHEN NOT xgt AND NOT xlt THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tie_x,
        |    CAST(SUM(CASE WHEN NOT ygt AND NOT ylt THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tie_y
        |  FROM p)
        |SELECT n_pairs, concordant, discordant, tie_x, tie_y,
        |  CAST(concordant - discordant AS DOUBLE)
        |    / SQRT(CAST(CAST(n_pairs - tie_x AS HUGEINT)
        |      * CAST(n_pairs - tie_y AS HUGEINT) AS DOUBLE)) AS tau_b
        |FROM c""".stripMargin,
    "q_modularity" ->
      s"""WITH pb AS (SELECT DISTINCT l.l_orderkey, l.l_partkey, p.p_brand
        |    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |ranked AS (SELECT l_orderkey, l_partkey, p_brand,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_partkey, p_brand) AS r FROM pb),
        |kept AS (SELECT l_orderkey, l_partkey, p_brand FROM ranked
        |  WHERE r <= ${Pipeline12.degreeCap}),
        |tg AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |    MAX(a.p_brand) AS cs, MAX(b.p_brand) AS cd
        |  FROM kept a JOIN kept b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS e_all FROM tg),
        |bc AS (SELECT cs AS community,
        |    CAST(COUNT(*) AS BIGINT) AS degree_sum,
        |    CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
        |    CAST(SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS BIGINT)
        |      AS intra_edges
        |  FROM tg GROUP BY 1),
        |terms AS (SELECT community, n_nodes, intra_edges, degree_sum,
        |    CAST(CAST(intra_edges AS DOUBLE) / CAST(e_all AS DOUBLE)
        |      - (CAST(degree_sum AS DOUBLE) / CAST(e_all AS DOUBLE))
        |        * (CAST(degree_sum AS DOUBLE) / CAST(e_all AS DOUBLE))
        |      AS DECIMAL(18,10)) AS contribution
        |  FROM bc, tot),
        |q AS (SELECT CAST(SUM(contribution) AS DOUBLE) AS modularity
        |  FROM terms)
        |SELECT community, n_nodes, intra_edges, degree_sum,
        |  CAST(contribution AS DOUBLE) AS contribution, modularity
        |FROM terms, q ORDER BY community""".stripMargin,
    "q_hill_tail" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |r AS (SELECT cents, CAST(ROW_NUMBER() OVER
        |    (ORDER BY cents DESC, o_orderkey) AS BIGINT) AS rk FROM o),
        |ref AS (SELECT MAX(CASE WHEN rk = 501 THEN cents END) AS x_ref
        |  FROM r WHERE rk <= 501),
        |terms AS (SELECT ref.x_ref,
        |    CAST(LN(CAST(cents AS DOUBLE) / CAST(x_ref AS DOUBLE))
        |      AS DECIMAL(18,10)) AS lr
        |  FROM r, ref WHERE rk <= 500)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k_top, x_ref,
        |  CAST(SUM(lr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS hill_mean,
        |  CAST(1 AS DOUBLE) / (CAST(SUM(lr) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) AS tail_alpha
        |FROM terms GROUP BY x_ref""".stripMargin,
    "q_block_maxima" ->
      s"""WITH d AS (SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate)
        |      AS BIGINT) AS m, o_orderdate,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1, 2),
        |mx AS (SELECT m, MAX(cents) AS mx FROM d GROUP BY 1),
        |a0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
        |    CAST(SUM(CAST(mx AS DECIMAL(38,0))) AS DOUBLE) AS sx,
        |    SUM(CAST(mx AS HUGEINT) * CAST(mx AS HUGEINT)) AS sxx0
        |  FROM mx),
        |a AS (SELECT n_months, sx, ${dblBigSql("sxx0")} AS sxx FROM a0),
        |b AS (SELECT n_months, sx / CAST(n_months AS DOUBLE) AS mean_max,
        |    SQRT((sxx - sx * sx / CAST(n_months AS DOUBLE))
        |      / CAST(n_months - 1 AS DOUBLE)) AS sd_max
        |  FROM a)
        |SELECT n_months, mean_max, sd_max,
        |  sd_max * SQRT(6.0) / PI() AS gumbel_beta,
        |  mean_max - 0.5772156649015329 * (sd_max * SQRT(6.0) / PI())
        |    AS gumbel_mu
        |FROM b""".stripMargin,
    "q_topk_turnover" ->
      """WITH rev AS (SELECT CAST(YEAR(l_shipdate) * 12 + MONTH(l_shipdate)
        |      AS BIGINT) AS m, l_partkey,
        |    CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |top AS (SELECT m, l_partkey FROM (
        |  SELECT m, l_partkey, ROW_NUMBER() OVER (PARTITION BY m
        |    ORDER BY cents DESC, l_partkey) AS rk FROM rev) t
        |  WHERE rk <= 10),
        |sizes AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS k FROM top GROUP BY 1),
        |common AS (SELECT a.m, CAST(COUNT(*) AS BIGINT) AS n_common
        |  FROM top a JOIN top b ON b.m = a.m + 1
        |    AND b.l_partkey = a.l_partkey
        |  GROUP BY 1)
        |SELECT sa.m AS month_a, sb.m AS month_b, sa.k AS k_a, sb.k AS k_b,
        |  COALESCE(common.n_common, 0) AS n_common,
        |  CAST(COALESCE(common.n_common, 0) AS DOUBLE)
        |    / CAST(sa.k + sb.k - COALESCE(common.n_common, 0) AS DOUBLE)
        |    AS jaccard
        |FROM sizes sa JOIN sizes sb ON sb.m = sa.m + 1
        |  LEFT JOIN common ON common.m = sa.m
        |ORDER BY month_a""".stripMargin,
    "q_chao1_richness" ->
      s"""WITH ${Pipeline.shinglesSql},
        |df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM sh GROUP BY 1),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM df)
        |SELECT v_obs, f1, f2,
        |  CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE)
        |    * CAST(f1 - 1 AS DOUBLE) / (2.0 * CAST(f2 + 1 AS DOUBLE))
        |    AS chao1
        |FROM a""".stripMargin)
}
