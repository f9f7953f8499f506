package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Dedup, Similarity}

/** Semantics specs for the pipeline operators on crafted documents —
  * the DuckDB oracle checks engine-parity on the harness tables; these
  * check the *algorithms* do what they claim (near-dups found, unrelated
  * docs not, ANN agrees with brute force on easy cases).
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // doc 1/2: near-identical (one word changed out of 12); doc 3:
  // unrelated; doc 4: exact copy of 1.
  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, "the quick brown fox jumps over the lazy cat near the river"),
    (3L, "completely different content about spark query engines and scale"),
    (4L, "the quick brown fox jumps over the lazy dog near the river")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts (docs 1 and 4)") {
    val copies = Dedup.exact(docs).as[(Long, Long)].collect().toMap
    assert(copies === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("shingles: n-2 word-3-grams, distinct, empty for short docs") {
    val sh = Dedup.shingles(docs.filter($"doc_id" === 1))
      .as[(Long, String)].collect().toSeq
    assert(sh.length === 10) // 12 words → 10 shingles, all distinct here
    assert(sh.contains((1L, "the quick brown")))
    val short = Dedup.shingles(Seq((9L, "two words")).toDF("doc_id", "text"))
    assert(short.count() === 0)
  }

  test("ngram jaccard finds the near-dup pair and not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, t10 = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // near-dup found
    assert(pairs.contains((1L, 4L))) // exact dup found
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated excluded
  }

  test("minhash LSH candidates recover high-jaccard pairs") {
    val pairs = Dedup.minhashLshPairs(docs, t10 = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical shingle sets always collide
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("resolveClusters: connected components keep the min doc_id") {
    // Pairs graph: {1-4, 2-4} one component, {7-8} another, 9 isolated
    // (not in pairs -> not in output).
    val pairs = Seq((1L, 4L), (2L, 4L), (7L, 8L)).toDF("a_id", "b_id")
    val clusters = Dedup.resolveClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("resolveClusters converges on a chain longer than one hop") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val clusters = Dedup.resolveClusters(chain)
      .as[(Long, Long)].collect().toMap
    assert(clusters.values.toSet === Set(1L))
  }

  test("DF-capped jaccard still finds near-dups, never shrinks denominators") {
    // Cap at df<=2: shingles shared by all three near-identical docs drop
    // out of candidate gen, but 1/2/4 still meet via rarer ("dog"/"cat")
    // shingles. `common` is undercounted (conservative), so assert at a
    // low threshold where the surviving common shingles still clear it.
    val capped = Dedup.jaccardPairs(docs, t10 = 1, maxShingleDf = 2)
      .select("a_id", "b_id", "n_a", "n_b").as[(Long, Long, Long, Long)].collect()
    val uncapped = Dedup.jaccardPairs(docs, t10 = 1)
      .select("a_id", "b_id", "n_a", "n_b").as[(Long, Long, Long, Long)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet.contains((1L, 4L)))
    // Denominators (per-doc totals) identical with and without the cap.
    val szCapped = capped.map(r => (r._1, r._3)).toMap
    val szFull = uncapped.map(r => (r._1, r._3)).toMap
    szCapped.keys.foreach(k => assert(szCapped(k) === szFull(k)))
  }

  test("hot-band cap bounds LSH candidates on a boilerplate-degenerate corpus") {
    // Pathological shape: 40 exact copies of one boilerplate doc (every
    // band value shared by all 40 → 4 buckets of size 40 → 3,120
    // candidate pairs uncapped) plus one genuinely-near pair with rare
    // band values. The cap must (a) drop the degenerate buckets, so
    // candidate volume stays bounded, and (b) leave the rare-pair
    // detection untouched — recall loss confined to oversized buckets,
    // exactly as the scaladoc claims.
    val boiler = (10L until 50L).map(i =>
      (i, "terms of service apply to all content provided herein always"))
    val rare = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy cat near the river"))
    val corpus = (boiler ++ rare).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(corpus, t10 = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(uncapped.size >= 40 * 39 / 2, s"degenerate corpus should explode: ${uncapped.size}")
    val capped = Dedup.minhashLshPairs(corpus, t10 = 1, maxBandDf = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)), "rare near-dup pair must survive the cap")
    assert(!capped.exists(p => p._1 >= 10L && p._2 >= 10L),
      s"boilerplate pairs must be excluded, got ${capped.size}")
  }

  test("minhash signature identical for identical shingle sets") {
    val sig = Dedup.minhashSignature(Dedup.shingles(docs))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sig(1L) === sig(4L))
    assert(sig(1L) !== sig(3L))
  }

  test("simhash: identical docs equal; near-dups closer than unrelated") {
    val sig = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    assert(sig(1L) === sig(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sig(1L), sig(2L)) < hamming(sig(1L), sig(3L)))
  }

  test("brute-force knn: nearest neighbor of a duplicated vector is its copy") {
    val e = Similarity.withNorm(Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding"))
    val top1 = Similarity.bruteForceKnn(e, e, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(top1(1L) === 4L) // exact copy wins (cos=1, id tiebreak)
    assert(top1(4L) === 1L)
    assert(top1(2L) === 1L) // nearly-parallel vector
  }

  test("sign-LSH bucket groups same-orthant vectors") {
    val e = Similarity.withNorm(Seq(
      (1L, Array(1.0f, 1.0f, 1.0f)),
      (2L, Array(0.9f, 0.8f, 0.7f)),
      (3L, Array(-1.0f, -1.0f, -1.0f))
    ).toDF("vec_id", "embedding"))
    val buckets = Similarity.signBucket(e, bits = 3)
      .select("vec_id", "bucket").as[(Long, String)].collect().toMap
    assert(buckets(1L) === buckets(2L))
    assert(buckets(1L) !== buckets(3L))
  }

  test("annLshKnn hot-bucket guards: cap bounds candidates, salt keeps results") {
    // 60 vectors, ALL in one bucket (every dim positive) — the skew
    // worst case. With maxBucket=8 the candidate side must be the 8
    // lowest vec_ids; salting must not change the result set.
    val vecs = (1L to 60L).map(i =>
      (i, Array.fill(8)(0.001f * i + 0.01f)))
    val e = Similarity.withNorm(vecs.toDF("vec_id", "embedding"))
    val capped = Similarity.annLshKnn(e, k = 3, bits = 4, maxBucket = 8)
    val rows = capped.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 <= 8L),
      s"candidates past the cap: ${rows.filter(_._2 > 8L).take(3).toSeq}")
    // Salting is partitioning-only: identical result set.
    val salted = Similarity.annLshKnn(e, k = 3, bits = 4, maxBucket = 8,
      salts = 4)
    assert(salted.orderBy("query_id", "rk").collect().toSeq ===
      capped.orderBy("query_id", "rk").collect().toSeq)
  }

  test("cosineNearDupPairs salting: identical pair set, no pair dropped") {
    // 40 vectors, ALL in one bucket — dedup semantics forbid a cap, so
    // salting is the only straggler guard and must be lossless: every
    // ordered pair (a<b) above threshold appears exactly once at any
    // salts setting.
    val vecs = (1L to 40L).map(i => (i, Array.fill(8)(0.001f * i + 0.01f)))
    val e = Similarity.withNorm(vecs.toDF("vec_id", "embedding"))
    def pairs(salts: Int): Seq[(Long, Long)] =
      Similarity.cosineNearDupPairs(e, threshold = 0.3, bits = 4,
          salts = salts)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    val unsalted = pairs(1)
    assert(unsalted.nonEmpty)
    assert(unsalted.distinct === unsalted) // no duplicates
    assert(pairs(4) === unsalted)
    assert(pairs(8) === unsalted)
    // Adaptive per-bucket salting: a tiny budget forces the hot bucket
    // to its 1024-salt clamp (pop²/budget = 1600/1 ≫ left rows — most
    // salt partitions empty), a huge one degenerates to the floor; the
    // pair set must be identical either way, at any floor.
    def adaptive(floor: Int, budget: Long): Seq[(Long, Long)] =
      Similarity.cosineNearDupPairs(e, threshold = 0.3, bits = 4,
          salts = floor, taskPairBudget = budget)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSeq.sorted
    assert(adaptive(1, 1L) === unsalted)
    assert(adaptive(8, 1L) === unsalted)
    assert(adaptive(8, Long.MaxValue) === unsalted)
  }

  test("scaledCells / scaledBits: exact knob arithmetic (oracle-mirrored)") {
    // scaledCells = max(16, ⌊√N⌋) — must equal the oracle's
    // GREATEST(16, FLOOR(SQRT(N))) at every N the gate can see.
    assert(Similarity.scaledCells(0) === 16)
    assert(Similarity.scaledCells(256) === 16)
    assert(Similarity.scaledCells(500) === 22)
    assert(Similarity.scaledCells(2000) === 44)
    assert(Similarity.scaledCells(2025) === 45)   // perfect square edge
    assert(Similarity.scaledCells(60000) === 244)
    // scaledBits = min(64, max(8, ceil(log2(ceil(N/16))))) via binary
    // string length — must equal LENGTH(BIN(GREATEST((N+15)//16 - 1, 0)))
    // clamped (the GREATEST(…,0) guard is what makes N=0 give 8 in the
    // oracle too; bare BIN(-1) is 64 one-bits in DuckDB).
    assert(Similarity.scaledBits(0) === 8)
    assert(Similarity.scaledBits(500) === 8)
    assert(Similarity.scaledBits(2000) === 8)
    assert(Similarity.scaledBits(4096) === 8)     // 256 buckets exactly
    assert(Similarity.scaledBits(4097) === 9)     // first step past 2^8
    assert(Similarity.scaledBits(20000) === 11)
    assert(Similarity.scaledBits(60000) === 12)
    // trillion-vector corpus: 2^40/16 buckets → 36 bits, well under the
    // 64-dim cap (the cap needs 2^64·16 vectors — unreachable).
    assert(Similarity.scaledBits(1L << 40) === 36)
  }

  test("IVF: Lloyd rounds + nprobe=2 improve recall@3 over raw seeds (sf0.01)") {
    val e = Similarity.withNorm(
      spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))
    val exact = Similarity.bruteForceKnn(e, e, k = 3)
      .select("query_id", "neighbor_id")
    val nExact = exact.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      ann.select("query_id", "neighbor_id").intersect(exact).count() / nExact
    val seeds = recall(Similarity.ivfKnn(e, nCells = 16, k = 3))
    val refined = recall(
      Similarity.ivfKnn(e, nCells = 16, k = 3, iters = 2, nprobe = 2))
    info(f"recall@3 seeds=$seeds%.3f refined=$refined%.3f")
    assert(refined > seeds,
      s"k-means + nprobe=2 should beat seed cells: $refined vs $seeds")
    // ~0.40 on this corpus (vs 0.22 for seeds): near-uniform 64-dim
    // vectors are the hard case for coarse quantizers — the floor guards
    // regressions, not a target.
    assert(refined >= 0.35, s"refined recall@3 unexpectedly low: $refined")
  }
}
