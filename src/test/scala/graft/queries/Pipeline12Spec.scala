package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline12Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Independent edge set: distinct ordered co-purchase pairs. */
  private def edgeSet(): Set[(Long, Long)] = {
    val li = graft.Tables(spark, dir, "lineitem")
      .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
    li.as("a").join(li.as("b"),
        $"a.ok" === $"b.ok" && $"a.pk" =!= $"b.pk")
      .select($"a.pk".as("src"), $"b.pk".as("dst")).distinct()
      .as[(Long, Long)].collect().toSet
  }

  test("q_bpe_doc_tokens: token counts bounded by words and characters") {
    val rows = Pipeline12.queries("q_bpe_doc_tokens")(spark, dir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (words, toks) = (r.getLong(1), r.getLong(2))
      assert(toks >= words, "every word costs at least one token")
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("q_graph_degrees histogram mass equals node count, edges conserved") {
    val rows = Pipeline12.queries("q_graph_degrees")(spark, dir).collect()
    val edges = edgeSet()
    val nodes = edges.map(_._1).size
    assert(rows.map(_.getLong(1)).sum === nodes.toLong)
    // Σ degree·n_nodes = |directed edges|
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === edges.size.toLong)
  }

  test("q_common_neighbors excludes adjacent pairs and is rank-ordered") {
    val rows = Pipeline12.queries("q_common_neighbors")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val edges = edgeSet()
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a < 500L && b > a)
      assert(!edges.contains((a, b)), s"($a,$b) must not be an existing edge")
      assert(r.getLong(2) >= 1L)
    }
    val counts = rows.map(_.getLong(2)).toSeq
    assert(counts === counts.sorted.reverse)
  }

  test("q_weighted_median matches a brute-force weighted median") {
    val rows = Pipeline12.queries("q_weighted_median")(spark, dir).collect()
    val data = graft.Tables(spark, dir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity".cast("long"))
      .as[(String, Double, Long)].collect()
    rows.foreach { r =>
      val (flag, got) = (r.getString(0), r.getDouble(1))
      val vw = data.filter(_._1 == flag).map(t => (t._2, t._3)).sortBy(_._1)
      val tot = vw.map(_._2).sum
      var cum = 0L
      val expect = vw.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(got === expect, s"flag $flag")
    }
  }
}
