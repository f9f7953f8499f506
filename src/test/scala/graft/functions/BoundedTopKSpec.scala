package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BoundedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 10

  /** Deterministic candidate-pair stream: unique (query_id, neighbor_id),
    * scores from a hash so reruns are stable, including exact ties ACROSS
    * neighbors (score = hash % 97 → many equal scores, broken by id).
    */
  private def pairs(nq: Int, perQ: Int): DataFrame =
    spark.range(nq.toLong * perQ).select(
      ($"id" % nq).as("query_id"),
      ($"id" / nq).cast("long").as("neighbor_id"),
      ((xxhash64($"id") % 97 + 97) % 97).cast("double").as("cos"))

  private def viaWindow(df: DataFrame): DataFrame = {
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id")
    df.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  private def viaAgg(df: DataFrame): DataFrame =
    df.groupBy($"query_id")
      .agg(BoundedTopK.topk($"cos", $"neighbor_id", k).as("__top"))
      .select($"query_id", posexplode($"__top").as(Seq("__pos", "__e")))
      .select($"query_id", $"__e.neighbor_id".as("neighbor_id"),
        $"__e.cos".as("cos"), ($"__pos" + 1).cast("long").as("rk"))

  private def collectSorted(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select($"query_id", $"neighbor_id", $"cos", $"rk")
      .as[(Long, Long, Double, Long)].collect().sortBy(r => (r._1, r._4)).toSeq

  test("bit-identical to the row_number window, ties included") {
    val df = pairs(nq = 37, perQ = 50)
    assert(collectSorted(viaAgg(df)) === collectSorted(viaWindow(df)))
  }

  test("groups smaller than k keep every pair, ranked") {
    val df = pairs(nq = 11, perQ = 4) // 4 < k
    val got = collectSorted(viaAgg(df))
    assert(got === collectSorted(viaWindow(df)))
    assert(got.count(_._1 == 0L) === 4)
  }

  test("partitioning-invariant: partial heaps merge to the same ranking") {
    val df = pairs(nq = 23, perQ = 40)
    val base = collectSorted(viaAgg(df.repartition(1)))
    Seq(7, 32).foreach { p =>
      assert(collectSorted(viaAgg(df.repartition(p))) === base,
        s"diverged at $p partitions")
    }
  }

  test("map-side partial: the exchange carries O(groups·k), not the pairs") {
    // The partial aggregate must appear BELOW the shuffle: find the
    // exchange and assert its child already aggregates (ObjectHashAggregate
    // or the sort-based fallback), i.e. at most k rows per group leave
    // each map task.
    val df = pairs(nq = 17, perQ = 200)
    // AQE wraps stages lazily and hides the exchange pre-execution;
    // the partial/final split is planning-time, so pin it off here.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try viaAgg(df).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    val partialBelowShuffle = exchanges.exists(_.child.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }.isDefined)
    assert(partialBelowShuffle,
      s"no partial aggregate below the exchange:\n$plan")
  }

  test("signed zeros rank identically to the SQL window ordering") {
    val df = Seq(
      (0L, 1L, 0.0), (0L, 2L, -0.0), (0L, 3L, -1.0), (0L, 4L, 2.0))
      .toDF("query_id", "neighbor_id", "cos")
    assert(collectSorted(viaAgg(df)) === collectSorted(viaWindow(df)))
  }

  test("-0.0 ranks equal to 0.0 but keeps its input bit pattern in the output") {
    // The comparator canonicalizes signed zeros on its KEY only (SQL
    // ordering: -0.0 == 0.0, tie broken by id) — the emitted cos must be
    // the input's exact bits, like the window it replaced (round-8
    // ADVICE). -0.0 is reachable: dot of an all-zero query against
    // negative components folds to -0.0.
    val df = Seq((0L, 1L, -0.0), (0L, 2L, 0.0), (0L, 3L, -0.0))
      .toDF("query_id", "neighbor_id", "cos")
    val got = viaAgg(df).select($"neighbor_id", $"cos")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L), "zero-tie must break by id")
    val bits = got.map(r => java.lang.Double.doubleToRawLongBits(r._2))
    val neg = java.lang.Double.doubleToRawLongBits(-0.0)
    val pos = java.lang.Double.doubleToRawLongBits(0.0)
    assert(bits.toSeq === Seq(neg, pos, neg), "input bit patterns must survive")
  }

  test("SQL graft_topk rejects wrong arity and non-constant k with clear errors") {
    pairs(2, 5).createOrReplaceTempView("topk_err_in")
    val arity = intercept[Exception] {
      spark.sql("SELECT graft_topk(cos, neighbor_id) FROM topk_err_in").collect()
    }
    assert(arity.getMessage.contains("exactly 3"), arity.getMessage)
    val nonConst = intercept[Exception] {
      spark.sql(
        "SELECT graft_topk(cos, neighbor_id, CAST(neighbor_id AS INT)) FROM topk_err_in")
        .collect()
    }
    assert(nonConst.getMessage.contains("constant integer"), nonConst.getMessage)
  }

  test("SQL graft_topk accepts any foldable integral k (long literal, expression)") {
    pairs(3, 20).createOrReplaceTempView("topk_fold_in")
    Seq("10L", "5 + 5", "CAST(10 AS INT)").foreach { kExpr =>
      val got = spark.sql(
        s"""SELECT query_id, size(graft_topk(cos, neighbor_id, $kExpr)) AS n
           |FROM topk_fold_in GROUP BY query_id""".stripMargin)
        .as[(Long, Int)].collect()
      assert(got.length === 3 && got.forall(_._2 === 10), s"k = $kExpr")
    }
  }

  test("registered as a SQL function via GraftExtensions") {
    pairs(5, 30).createOrReplaceTempView("topk_in")
    val got = spark.sql(
      s"""SELECT query_id, graft_topk(cos, neighbor_id, $k) AS top
         |FROM topk_in GROUP BY query_id""".stripMargin)
      .select($"query_id", size($"top").as("n")).as[(Long, Int)].collect()
    assert(got.length === 5 && got.forall(_._2 === k))
  }

  test("ANN call sites feed duplicate-free pairs (bucket/cell uniqueness)") {
    // The window↔aggregate equivalence requires each (query, neighbor)
    // pair at most once; a corpus vector lives in exactly one LSH
    // bucket / IVF cell, so candidate joins can't duplicate a pair.
    val e = graft.operators.Similarity.withNorm(
      spark.range(200).select($"id".as("vec_id"),
        expr("transform(sequence(1, 8), i -> CAST(pmod(hash(id * i), 19) AS DOUBLE) / 19.0)")
          .as("embedding")),
      "vec_id", "embedding")
    val b = graft.operators.Similarity.signBucket(e, bits = 4)
    val dupes = b.as("q").join(b.as("c"),
        col("q.bucket") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id"))
      .groupBy(col("q.vec_id"), col("c.vec_id")).count()
      .filter($"count" > 1).count()
    assert(dupes === 0L)
  }
}
