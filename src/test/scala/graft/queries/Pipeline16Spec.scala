package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_ngram_novelty: doc 0 is fully novel; totals match a brute-force census") {
    val rows = Pipeline16.queries("q_ngram_novelty")(spark, dir).collect()
    val first = rows.head
    assert(first.getLong(0) === 0L)
    if (first.getLong(1) > 0)
      assert(first.getLong(2) === first.getLong(1),
        "the lowest doc_id introduces every one of its shingles")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (r.getLong(1) > 0)
        assert(r.getDouble(3) === r.getLong(2).toDouble / r.getLong(1))
    }
    // Every shingle is introduced exactly once across the corpus.
    val docs = graft.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val perDoc = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      id -> (if (ws.length < 5) Set.empty[String]
             else (0 to ws.length - 5).map(i =>
               ws.slice(i, i + 5).mkString(" ")).toSet)
    }
    val allDistinct = perDoc.flatMap(_._2).toSet
    assert(rows.map(_.getLong(2)).sum === allDistinct.size.toLong)
    assert(rows.map(_.getLong(1)).sum ===
      perDoc.map(_._2.size.toLong).sum)
  }

  test("q_last_touch_attribution conserves purchases and revenue") {
    val rows = Pipeline16.queries("q_last_touch_attribution")(spark, dir)
      .collect()
    val purchases = graft.Tables(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select(round($"value" * 100).cast("long")).as[Long].collect()
    assert(rows.map(_.getLong(1)).sum === purchases.length.toLong)
    assert(rows.map(_.getLong(2)).sum === purchases.sum)
    // attribution days never exceed the purchase-day span
    rows.filter(_.getString(0) != "none").foreach(r =>
      assert(r.getString(0).matches("""\d{4}-\d{2}-\d{2}""")))
  }

  test("q_join_cardinality: exact Σc² matches the real join size; estimate is sane") {
    val r = Pipeline16.queries("q_join_cardinality")(spark, dir).collect().head
    val li = graft.Tables(spark, dir, "lineitem").select($"l_partkey")
    val joinRows = li.as("a").join(li.as("b"),
      col("a.l_partkey") === col("b.l_partkey")).count()
    assert(r.getLong(0) === joinRows)
    assert(r.getLong(2) <= 512L && r.getLong(2) <= r.getLong(1))
    if (r.getLong(2) === r.getLong(1))
      assert(r.getDouble(4) === 0.0,
        "a full sample must estimate exactly")
  }

  test("q_temporal_leakage: leaked is bounded by both sides; rates consistent") {
    val r = Pipeline16.queries("q_temporal_leakage")(spark, dir).collect().head
    val (tr, te, lk) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(lk <= tr && lk <= te)
    assert(r.getDouble(3) === lk.toDouble / te)
    assert(r.getLong(5) <= r.getLong(4))
    assert(r.getDouble(6) === r.getLong(5).toDouble / r.getLong(4))
  }

  test("q_freq_triples: supports are descending and each triple is brand-ordered") {
    val rows = Pipeline16.queries("q_freq_triples")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val sups = rows.map(_.getLong(3))
    assert(sups.zip(sups.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1) &&
        r.getString(1) < r.getString(2))
      assert(r.getLong(3) >= 3L)
    }
  }
}
