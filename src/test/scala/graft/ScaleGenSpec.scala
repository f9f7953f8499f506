package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct tests for the scale/skew corpus generator. The entire skew
  * and scaling evidence chain (BENCH_SCALE.md, BENCH_STREAM.md) rests
  * on ScaleGen's invariants, so they get pinned here instead of only
  * being asserted in prose:
  *  - row multiplication is exact (facts ×factor, dims ×1);
  *  - referential integrity survives the key remapping;
  *  - skew mode moves the DISTRIBUTION only — same row counts, hot
  *    fraction ≈ skewPct, and the domain-specific hot artifacts the
  *    harness measures against (shared sign-LSH bucket, shared hot
  *    sentence) actually hold;
  *  - copy 0 is the identity (cold rows byte-equal to the source).
  */
class ScaleGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val src = "/root/testdata/sf0.001"
  private lazy val out: String = {
    val dir = Files.createTempDirectory("scalegen_spec").toString
    ScaleGen.run(spark, src, dir, factor = 2, skewPct = 25)
    dir
  }

  private def t(name: String) = Tables(spark, out, name)
  private def s(name: String) = Tables(spark, src, name)

  test("facts multiply by factor; fixed dims copy through once") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() === 2 * s(n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() === s(n).count(), n)
  }

  test("referential integrity holds across remapped copies") {
    assert(t("lineitem").select("l_orderkey")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() === 0)
    assert(t("orders").select("o_custkey")
      .join(t("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
      .count() === 0)
    assert(t("lineitem").select("l_partkey")
      .join(t("part"), col("l_partkey") === col("p_partkey"), "left_anti")
      .count() === 0)
  }

  test("skew: one hot customer holds ~skewPct of orders, row counts unmoved") {
    val o = t("orders")
    val total = o.count().toDouble
    val top = o.groupBy("o_custkey").count()
      .orderBy(col("count").desc).head()
    val share = top.getLong(1) / total
    // driving residue is o_orderkey % 100 < 25 → ~25% of orders point
    // at the single hot customer (copy-0 min custkey)
    assert(share > 0.15 && share < 0.35, s"hot share $share")
    val hotCust = s("customer").agg(min("c_custkey")).head().getLong(0)
    assert(top.getLong(0) === hotCust)
  }

  test("skew: hot vectors share ONE sign-LSH bucket; cold copy-0 rows are identity") {
    val e = t("embeddings")
    // hot selector is vec_id % 100 < 25 (offsets are powers of 10 that
    // preserve the residue); the hot transform forces dims 0-15 >= 0,
    // i.e. every hot vector lands in the same bucket at any bits <= 16
    val buckets = e.filter(col("vec_id") % 100 < 25)
      .select(expr("array_join(transform(slice(embedding, 1, 16), " +
        "v -> CASE WHEN v > 0 THEN '1' ELSE '0' END), '')").as("b"))
      .distinct().collect().map(_.getString(0))
    assert(buckets.length === 1, buckets.mkString(","))
    assert(!buckets(0).contains("0"))
    // cold copy-0 vectors must be byte-identical to the source
    val srcMax = s("embeddings").agg(max("vec_id")).head().getLong(0)
    val changed = e.filter(col("vec_id") <= srcMax && col("vec_id") % 100 >= 25)
      .select(col("vec_id"), col("embedding"))
      .join(s("embeddings").select(col("vec_id"),
        col("embedding").as("src_emb")), "vec_id")
      .filter(col("embedding") =!= col("src_emb"))
      .count()
    assert(changed === 0)
  }

  test("skew: hot documents share the hot sentence; n_chars stays consistent") {
    val d = t("documents")
    assert(d.filter(col("doc_id") % 100 < 25 &&
      !col("text").endsWith(" the quick brown fox jumps over the lazy dog"))
      .count() === 0)
    assert(d.filter(col("n_chars") =!= length(col("text"))).count() === 0)
  }

  test("copies are not near-duplicates: cross-copy token overlap is broken") {
    val d = t("documents")
    val srcMax = s("documents").agg(max("doc_id")).head().getLong(0)
    // a copy-1 COLD doc's text must differ from its copy-0 original
    // (the word-prefix transform), keeping the duplicate RATE constant
    val off = d.agg(max("doc_id")).head().getLong(0) > srcMax
    assert(off)
    // set-level disjointness: no copy-1 cold text verbatim-equals any
    // copy-0 text (the word-prefix transform rewrites every space, so
    // only space-free texts could collide — excluded)
    val overlap = d.filter(col("doc_id") > srcMax &&
        col("doc_id") % 100 >= 25 && col("text").contains(" "))
      .select(col("text"))
      .join(s("documents").select(col("text")), Seq("text"), "inner").count()
    assert(overlap === 0, s"copy-1 texts verbatim-equal to copy-0: $overlap")
  }
}
