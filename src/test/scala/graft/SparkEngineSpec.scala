package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the heap-aware broadcast ceiling (SparkEngine.broadcastThreshold)
  * measured in the sf1 memory sweep (BENCH_MEM.md): at production heaps
  * the threshold must be EXACTLY Spark's stock 10 MB so plans stay
  * bit-identical to an unconfigured session; below the 5 GiB crossover it
  * derates linearly so a small driver never plans a broadcast build its
  * heap can't hold ("Not enough memory to build and broadcast").
  */
class SparkEngineSpec extends AnyFunSuite {
  private val MiB = 1L << 20
  private val GiB = 1L << 30

  test("stock 10 MB at and above the 5 GiB crossover") {
    assert(SparkEngine.broadcastThreshold(5 * GiB) === 10 * MiB)
    assert(SparkEngine.broadcastThreshold(24 * GiB) === 10 * MiB)
    assert(SparkEngine.broadcastThreshold(128 * GiB) === 10 * MiB)
  }

  test("derates linearly below 5 GiB: heap/512") {
    assert(SparkEngine.broadcastThreshold(2 * GiB) === 4 * MiB)
    assert(SparkEngine.broadcastThreshold(4 * GiB) === 8 * MiB)
    assert(SparkEngine.broadcastThreshold(5 * GiB - 512) < 10 * MiB)
  }

  test("session conf carries the derated value for this JVM's heap") {
    val s = TestSpark.spark
    val expected = SparkEngine.broadcastThreshold().toString
    assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") === expected)
  }

  test("ObjectHashAggregate fallback ceiling is raised past real key domains") {
    // Spark's default 128-key fallback turns every per-group top-k
    // partial into a full-stream sort (q_embed_ivf at ×1000: 239 GB
    // spill — the exact sort BoundedTopK exists to avoid). The engine
    // pins 65536: top-k buffers are ≤16k+ε bytes, so the partial map
    // stays ≲33 MB/task at the ceiling.
    assert(TestSpark.spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") === "65536")
  }

  test("SPARK_GRAFT_CONF pass-through: malformed entry fails naming the token") {
    import org.apache.spark.sql.SparkSession
    val e = intercept[IllegalArgumentException] {
      SparkEngine.applyConfPassThrough(SparkSession.builder(), Some("a=b;oops"))
    }
    assert(e.getMessage.contains("oops"), e.getMessage)
    assert(e.getMessage.contains("SPARK_GRAFT_CONF"), e.getMessage)
    // well-formed entries (incl. '=' in the value) parse fine
    SparkEngine.applyConfPassThrough(
      SparkSession.builder(), Some("k1=v1; k2=a=b ;"))
  }

  test("SPARK_GRAFT_CONF pass-through wins over a previously pinned conf") {
    // Verify/Bench apply the pass-through AFTER their hardcoded .config
    // chain; Builder semantics are last-write-wins, so the override must
    // land in the session conf (Verify used to fold it in FIRST and
    // silently lose overrides of pinned keys — round-10 advice).
    val s = TestSpark.spark
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val b = SparkSession.builder().config("spark.graft.test.pin", "pinned")
      val s2 = SparkEngine.applyConfPassThrough(
        b, Some("spark.graft.test.pin=overridden")).getOrCreate()
      assert(s2.conf.get("spark.graft.test.pin") === "overridden")
    } finally {
      SparkSession.setActiveSession(s)
      SparkSession.setDefaultSession(s)
    }
  }
}
