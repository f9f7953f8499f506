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
}
