package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions.{md5fast => md5f}

/** Deduplication operators for document corpora: exact, n-gram Jaccard,
  * and MinHash+LSH near-dup detection. Pure DataFrame transformations —
  * every step is a hash-partitionable equi-join or aggregation, so the
  * same plans scale from local[32] to a 1000-executor cluster.
  *
  * Design choices for 100 TB:
  *  - exact dedup groups on md5(text): the shuffle key is 32 bytes, not
  *    the document;
  *  - near-dup detection is LSH-banded: candidate generation is an
  *    equi-join on band values (sub-quadratic), and only candidates pay
  *    the exact-Jaccard verification;
  *  - the Jaccard threshold test is integer arithmetic
  *    (`common*10 >= t10*(|A|+|B|-common)`) — reproducible everywhere;
  *  - hashes are md5 so any engine (including the DuckDB oracle) can
  *    replay them bit-for-bit.
  */
object Dedup {

  /** Keep one row per distinct value of `textCol` (min of `idCol` wins),
    * with the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5f(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Distinct word-3-gram shingles per document: (doc_id, shingle).
    * Guarded transform — Spark's `sequence(0, n)` DESCENDS for n<0, so
    * docs under 3 words need the explicit empty branch.
    */
  def shingles(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("shingle", explode(
        when(size(col("ws")) >= 3,
          expr("transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))))
      .select(col("doc_id"), col("shingle"))
      .distinct()

  /** doc_id → k-hash MinHash signature (mh1..mhk). h_j(s) = md5("j|"++s),
    * min per doc per j.
    */
  def minhashSignature(sh: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 1)
    sh.groupBy(col("doc_id"))
      .agg(
        min(md5f(concat(lit("1|"), col("shingle")))).as("mh1"),
        (2 to k).map(j => min(md5f(concat(lit(s"$j|"), col("shingle")))).as(s"mh$j")): _*)
  }

  /** Exact-Jaccard verification over candidate (a_id, b_id) pairs:
    * keep iff common/union >= t10/10. Joins are restricted to the
    * candidate set — this is the "verify" half of LSH dedup.
    */
  def jaccardVerify(cand: DataFrame, sh: DataFrame, t10: Int): DataFrame = {
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sh.as("sb"), col("b_id") === col("sb.doc_id") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sz.as("za"), col("a_id") === col("za.doc_id"))
      .join(sz.as("zb"), col("b_id") === col("zb.doc_id"))
      .select(
        col("a_id"), col("b_id"), col("common"),
        col("za.n").as("n_a"), col("zb.n").as("n_b"))
      .filter(col("common") * 10 >= (col("n_a") + col("n_b") - col("common")) * t10)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** All-pairs-sharing-a-shingle near-dup detection (baseline; quadratic
    * in bucket size — use [[minhashLshPairs]] at scale).
    *
    * `common` is aggregated straight off the shingle self-join — one
    * shuffle keyed on (a_id, b_id) with map-side partial counts — rather
    * than materializing distinct candidate pairs and re-joining them to
    * the shingle table (which multiplies every pair by its shingle count
    * before the match filter; ~45× more intermediate rows on the sf0.1
    * corpus).
    */
  def jaccardPairs(docs: DataFrame, t10: Int): DataFrame =
    jaccardPairs(docs, t10, maxShingleDf = 0)

  /** As [[jaccardPairs]], but when `maxShingleDf > 0` shingles appearing
    * in more than that many documents are EXCLUDED from candidate
    * generation (they still count toward each doc's shingle total, so
    * Jaccard denominators are exact). A shingle shared by d docs creates
    * d·(d-1)/2 join rows — at corpus scale, boilerplate shingles ("terms
    * of service") are the quadratic hot spot, and documents that are
    * genuine near-dups still meet through their rarer shingles. The
    * standard DF-cap trick; a recall/cost knob, so default off for
    * oracle parity.
    */
  def jaccardPairs(docs: DataFrame, t10: Int, maxShingleDf: Int): DataFrame = {
    val shAll = shingles(docs)
    val sh =
      if (maxShingleDf <= 0) shAll
      else {
        val hot = shAll.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf)
          .select(col("shingle"))
        shAll.join(hot, Seq("shingle"), "left_anti")
      }
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("common"))
    // Totals from the UNCAPPED set: DF-capping may undercount `common`
    // (conservative) but must never shrink the denominators.
    val sz = shAll.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    common
      .join(sz.as("za"), col("a_id") === col("za.doc_id"))
      .join(sz.as("zb"), col("b_id") === col("zb.doc_id"))
      .select(
        col("a_id"), col("b_id"), col("common"),
        col("za.n").as("n_a"), col("zb.n").as("n_b"))
      .filter(col("common") * 10 >= (col("n_a") + col("n_b") - col("common")) * t10)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash+LSH near-dup detection: 4 bands × 2 rows banding over an
    * 8-hash signature; band-bucket equi-join for candidates; exact
    * verification at `t10/10` Jaccard.
    */
  def minhashLshPairs(docs: DataFrame, t10: Int): DataFrame =
    minhashLshPairs(docs, t10, maxBandDf = 0)

  /** As [[minhashLshPairs]], but when `maxBandDf > 0` band buckets holding
    * more than that many documents are EXCLUDED from candidate generation.
    * A bucket of d docs creates d·(d-1)/2 candidate rows — one degenerate
    * band value (boilerplate corpora, near-constant signatures) re-creates
    * the quadratic blowup LSH exists to avoid. True near-dup pairs still
    * meet through their other 3 bands, so recall loss is confined to pairs
    * that ONLY collide in oversized buckets — at that bucket size they are
    * boilerplate, not duplicates. A recall/cost knob like
    * [[jaccardPairs]]'s `maxShingleDf`; default off for oracle parity.
    */
  def minhashLshPairs(docs: DataFrame, t10: Int, maxBandDf: Int): DataFrame = {
    val sh = shingles(docs)
    val allBands = minhashSignature(sh, 8).select(
      col("doc_id"),
      posexplode(array(
        md5f(concat(col("mh1"), col("mh2"))),
        md5f(concat(col("mh3"), col("mh4"))),
        md5f(concat(col("mh5"), col("mh6"))),
        md5f(concat(col("mh7"), col("mh8"))))))
      .toDF("doc_id", "band_idx", "band_val")
    val bands =
      if (maxBandDf <= 0) allBands
      else {
        val hot = allBands.groupBy(col("band_idx"), col("band_val"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxBandDf)
          .select(col("band_idx"), col("band_val"))
        allBands.join(hot, Seq("band_idx", "band_val"), "left_anti")
      }
    val cand = bands.as("x")
      .join(bands.as("y"), col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    jaccardVerify(cand, sh, t10)
  }

  /** Resolve near-dup pairs into clusters and pick survivors: connected
    * components by iterated min-label propagation. Each round joins the
    * current labels across the edge list and takes the min over a node's
    * neighborhood (plus itself); converges in O(component diameter)
    * rounds — near-dup clusters are tiny and dense, so a handful. Returns
    * (doc_id, keep_id) where keep_id = min doc_id of the component.
    *
    * At 100 TB: every round is one equi-join + one aggregation on
    * (doc_id) — hash-partitioned, AQE-skew-splittable; no driver-side
    * graph. `maxIter` bounds the cost; label stability is checked so
    * converged inputs stop early.
    */
  def resolveClusters(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // Materialize the edge list once: it joins into EVERY round, and an
    // unmaterialized plan would re-run the whole upstream pair-detection
    // pipeline (shingles → minhash → LSH → verify) per iteration.
    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionByName(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("a_id").as("doc_id")).distinct()
    var labels = nodes.withColumn("keep_id", col("doc_id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = edges
        .join(labels, edges("b_id") === labels("doc_id"))
        .groupBy(edges("a_id").as("doc_id"))
        .agg(min(col("keep_id")).as("n_min"))
      val next = labels.as("l")
        .join(neighborMin.as("m"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("keep_id"), coalesce(col("n_min"), col("keep_id"))).as("keep_id"))
      // Truncate lineage: without this every round's action re-derives
      // all previous rounds (quadratic recompute in iteration count).
      val materialized = next.localCheckpoint()
      // Convergence check: did any label move this round?
      val moved = materialized.as("n").join(labels.as("p"), Seq("doc_id"))
        .filter(col("n.keep_id") =!= col("p.keep_id")).limit(1).count()
      labels = materialized
      converged = moved == 0
      iter += 1
    }
    // Labels of a component wider than maxIter hops have NOT reached the
    // component minimum — surface it rather than return silently-partial
    // clusters (callers compare against true transitive closure).
    if (!converged)
      System.err.println(
        s"[graft] resolveClusters: label propagation did not converge in " +
          s"$maxIter iterations; keep_ids may be non-minimal for components " +
          s"with diameter > $maxIter")
    labels
  }

  /** 60-bit SimHash over word tokens (sign-sum per bit). Token hashes are
    * the first 15 hex digits of md5 — 60 bits, chosen over xxhash64 so any
    * engine (including the DuckDB oracle) replays the signature
    * bit-for-bit; SimHash quality only needs a uniform hash, not a
    * specific one.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bits = 60
    val tokens = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("tok", explode(split(col("text"), " ")))
      .withColumn("h", conv(substring(md5f(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitCols = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val sums = tokens.groupBy(col("doc_id")).agg(bitCols.head, bitCols.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("doc_id"), sig.as("simhash"))
  }
}
