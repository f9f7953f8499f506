package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import graft.TestSpark

/** Adversarial property coverage for Dedup.resolveClusters (the
  * per-partition union-find + geometric cross-partition contraction that
  * underpins q_dedup_clusters, q_graph_cc, q_cc_histogram): its
  * (node → component-minimum) output must equal a sequential union-find
  * computed in-test, for ANY input partitioning. Hostile shapes: long
  * chains (component diameter ≫ contraction levels — the case a
  * fixed-round label-propagation would get wrong), stars, rings,
  * duplicate and self-loop edges, edges listed in both orientations,
  * many singleton-ish components, and partition counts that scatter
  * every chain across partitions.
  */
object DedupClustersPropertySpec extends Properties("dedupclusters") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val cases = for {
    shape <- Gen.oneOf("chain", "ring", "star", "random", "mixed")
    n <- Gen.oneOf(2, 17, 200, 1200)
    parts <- Gen.oneOf(1, 7, 32)
    extra <- Gen.listOfN(n / 4, for {
      a <- Gen.chooseNum(0L, n.toLong)
      b <- Gen.chooseNum(0L, n.toLong)
    } yield (a, b))
    dup <- Gen.oneOf(true, false)
  } yield {
    val base: Seq[(Long, Long)] = shape match {
      case "chain" => (0L until n).map(i => (i, i + 1))
      case "ring" => (0L until n).map(i => (i, (i + 1) % n))
      case "star" => (1L to n.toLong).map(i => (0L, i))
      case "random" => extra
      case "mixed" =>
        // two chains + a star + the random edges; ids offset so
        // components interleave before the random edges bridge them
        (0L until n / 2).map(i => (i, i + 1)) ++
          (0L until n / 2).map(i => (10000L + i, 10000L + i + 1)) ++
          (1L to 20L).map(i => (20000L, 20000L + i)) ++ extra
    }
    val withNoise =
      if (dup) base ++ base.map { case (a, b) => (b, a) } ++
        base.take(3).map { case (a, _) => (a, a) }
      else base
    (withNoise, parts)
  }

  private def sequentialComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent.getOrElse(x, x)
      parent(x0) = x
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("component minima match a sequential union-find for any partitioning") =
    forAllNoShrink(cases) { case (edges, parts) =>
      import spark.implicits._
      val df = spark.sparkContext
        .parallelize(edges, math.max(parts, 1))
        .toDF("a_id", "b_id")
      val got = Dedup.resolveClusters(df)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = sequentialComponents(edges)
      val ok = got == want
      if (!ok) {
        val bad = want.keys.filter(k => got.get(k) != want.get(k)).take(5)
        println(s"MISMATCH parts=$parts edges=${edges.size}: " +
          bad.map(k => s"$k got=${got.get(k)} want=${want.get(k)}").mkString("; "))
      }
      ok
    }
}
