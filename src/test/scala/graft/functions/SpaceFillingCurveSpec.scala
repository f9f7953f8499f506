package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.CurveFunctions.hilbert

class SpaceFillingCurveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("d2xy/xy2d are inverse over the full 256×256 grid") {
    var d = 0L
    while (d < 65536L) {
      val (x, y) = HilbertIndex.d2xy(d)
      assert(HilbertIndex.xy2d(x, y) == d, s"roundtrip broke at d=$d ($x,$y)")
      d += 1
    }
  }

  test("the curve is a Hamiltonian path: every step moves one cell in one axis") {
    // THE property that distinguishes Hilbert from Z-order: consecutive
    // indices are always grid-adjacent (no Z-jumps), so an index-range
    // scan reads a connected region of key space.
    var prev = HilbertIndex.d2xy(0L)
    var d = 1L
    while (d < 65536L) {
      val cur = HilbertIndex.d2xy(d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"non-adjacent step at d=$d: $prev -> $cur")
      prev = cur
      d += 1
    }
  }

  test("curve origin and corner anchors") {
    assert(HilbertIndex.xy2d(0L, 0L) == 0L)
    // the order-8 curve ends at (255, 0): last index maps to the far corner
    assert(HilbertIndex.d2xy(65535L) == ((255L, 0L)))
    // inputs above the grid wrap by masking to 8 bits
    assert(HilbertIndex.xy2d(256L + 3L, 512L + 7L) == HilbertIndex.xy2d(3L, 7L))
  }

  test("the Catalyst expression matches the Scala function and is null-safe") {
    val df = spark.range(2048).select(
      ($"id" % 256).as("x"), (($"id" * 37) % 256).as("y"))
    val rows = df.select($"x", $"y", hilbert($"x", $"y").as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(2) == HilbertIndex.xy2d(r.getLong(0), r.getLong(1)))
    }
    val nulls = Seq((Some(1L), None: Option[Long]), (None, Some(2L)))
      .toDF("x", "y")
      .select(hilbert($"x", $"y").as("h")).collect()
    assert(nulls.forall(_.isNullAt(0)), "null input must yield null")
  }

  test("hilbert-bucketed layout write prunes partitions under either-dimension filters") {
    // The point of the curve value: ONE partition column gives data
    // skipping on BOTH underlying keys. Write bucketed by hval>>10,
    // then filter on a narrow range of either original dimension — the
    // matching buckets are few because curve-adjacent cells are
    // grid-adjacent, and the scan must show a partition filter rather
    // than reading the full layout.
    val dir = java.nio.file.Files.createTempDirectory("hilbert_layout").toString
    val df = spark.range(65536).select(
      ($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
      .withColumn("hval", hilbert($"x", $"y"))
      .withColumn("h_bucket", ($"hval" / 1024).cast("long"))
    df.write.partitionBy("h_bucket").mode("overwrite").parquet(dir)

    val back = spark.read.parquet(dir)
    // a 16×16 box touches few curve buckets; resolve them exactly the
    // way a layout-aware reader would: from the curve function itself
    val buckets = (for (x <- 0L until 16L; y <- 0L until 16L)
      yield HilbertIndex.xy2d(x, y) / 1024).distinct.sorted
    assert(buckets.length <= 4, s"16x16 box hit ${buckets.length} of 64 buckets")
    val pruned = back.filter($"h_bucket".isin(buckets: _*) &&
      $"x" < 16 && $"y" < 16)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("h_bucket"), scan)
    assert(pruned.count() == 256, "box content must survive pruning intact")
  }

  test("the expression compiles into whole-stage codegen") {
    val df = spark.range(16).select(hilbert($"id", $"id").as("h"))
    // codegen'd stages print with the "*(n)" fusion marker; a non-codegen
    // projection would print a bare "Project"
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_hilbert"),
      s"hilbert fell out of codegen:\n$plan")
  }
}
