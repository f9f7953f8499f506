package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the correctness baseline, and
  * coordinate-sign LSH bucketing as the scale path.
  *
  * Scale design: brute force is #queries × N — fine when the query set is
  * bounded (it is a broadcast-able side), never N² over the corpus. The
  * LSH variant buckets the corpus once (narrow, no shuffle beyond the
  * bucket groupBy) and only pairs within a bucket, trading recall for a
  * ~2^bits reduction of the pair space. Both keep the arithmetic in
  * left-to-right double folds so results are reproducible (and match the
  * DuckDB oracle bit-for-bit).
  */
object Similarity {

  /** vec_id + embedding as array<double> + L2 norm. */
  def withNorm(embeddings: DataFrame,
      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol).as("vec_id"),
        expr(s"transform($embCol, v -> CAST(v AS DOUBLE))").as("emb"))
      .withColumn("nrm", sqrt(dot(col("emb"), col("emb"))))

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("query_id"), col("rk"))
  }

  /** Brute-force cosine top-k of `corpus` for each row of `queries`
    * (both pre-normed via [[withNorm]]). Exact; the ANN oracle.
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topK(
      queries.as("q")
        .join(corpus.as("c"), col("q.vec_id") =!= col("c.vec_id"))
        .select(
          col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          (dot(col("q.emb"), col("c.emb")) / (col("q.nrm") * col("c.nrm"))).as("cos")),
      k)

  /** Coordinate-sign LSH bucket: one bit per leading dimension's sign. */
  def signBucket(e: DataFrame, bits: Int = 8): DataFrame = {
    val bucketBits = (1 to bits).map(i =>
      when(element_at(col("emb"), i) > 0, lit("1")).otherwise(lit("0")))
    e.withColumn("bucket", concat(bucketBits: _*))
  }

  /** Embedding-cosine near-duplicate pairs: candidates from sign-LSH
    * buckets, kept when exact cosine ≥ threshold. The dedup-by-embedding
    * counterpart of [[Dedup.minhashLshPairs]] — candidate generation is a
    * bucket equi-join (pair space / ~2^bits), and only candidates pay the
    * exact dot product.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
      bits: Int = 8): DataFrame = {
    val b = signBucket(embeddings, bits)
    b.as("a")
      .join(b.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm"))).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** IVF cell assignment: nearest (by cosine) of `k` seed centroids.
    * Seeds are the `k` lowest vec_ids — deterministic, so the DuckDB
    * oracle can replay the exact partition (real IVF would k-means the
    * seeds; the assignment/probe machinery is identical). The centroid
    * side broadcasts (k rows), so assignment is a narrow N×k pass.
    */
  def ivfAssign(embeddings: DataFrame, k: Int): DataFrame = {
    val cents = embeddings.filter(col("vec_id") < k).select(
      col("vec_id").as("c_id"), col("emb").as("c_emb"), col("nrm").as("c_nrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("c_id"))
    embeddings.join(broadcast(cents))
      .withColumn("c_cos",
        dot(col("emb"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("c_id").as("cell"))
  }

  /** IVF-flat ANN top-k: search only within the query's cell (nprobe=1).
    * Pair space shrinks from N² to Σ|cell|² — the coarse-quantizer
    * analogue of [[annLshKnn]]'s hyperplane buckets.
    */
  def ivfKnn(embeddings: DataFrame, nCells: Int, k: Int): DataFrame = {
    val a = ivfAssign(embeddings, nCells)
    topK(
      a.as("q")
        .join(a.as("c"), col("q.cell") === col("c.cell") &&
          col("q.vec_id") =!= col("c.vec_id"))
        .select(
          col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          (dot(col("q.emb"), col("c.emb")) / (col("q.nrm") * col("c.nrm"))).as("cos")),
      k)
  }

  /** ANN top-k restricted to sign-LSH buckets. Recall < 1 by design;
    * cheap at scale (pair space divided by ~2^bits for centered data).
    */
  def annLshKnn(embeddings: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val b = signBucket(embeddings, bits)
    topK(
      b.as("q")
        .join(b.as("c"), col("q.bucket") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
        .select(
          col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
          (dot(col("q.emb"), col("c.emb")) / (col("q.nrm") * col("c.nrm"))).as("cos")),
      k)
  }
}
