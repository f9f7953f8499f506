package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline10Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bpeMerge is the greedy left-to-right non-overlapping scan") {
    // "a a a b": merging (a,a) must produce [aa, a, b] — the greedy scan
    // consumes the first two a's and must NOT re-merge the fresh "aa"
    // with the trailing "a".
    val words = Seq((1L, Seq("a", "a", "a", "b"))).toDF("n", "toks")
    val best = Seq(("a", "a")).toDF("a", "b")
    val got = Pipeline10.bpeMerge(words, best).select($"toks")
      .as[Seq[String]].head()
    assert(got === Seq("aa", "a", "b"))
    // consecutive disjoint occurrences both merge: "a b a b" -> [ab, ab]
    val w2 = Seq((1L, Seq("a", "b", "a", "b"))).toDF("n", "toks")
    val b2 = Seq(("a", "b")).toDF("a", "b")
    val got2 = Pipeline10.bpeMerge(w2, b2).select($"toks").as[Seq[String]].head()
    assert(got2 === Seq("ab", "ab"))
  }

  test("bpePairCounts weights by word frequency and skips 1-token words") {
    val words = Seq(
      (3L, Seq("h", "i")),      // pair (h,i) ×3
      (2L, Seq("h", "i", "i")), // pairs (h,i) ×2, (i,i) ×2
      (5L, Seq("hi"))           // no pairs — must not fabricate any
    ).toDF("n", "toks")
    val m = Pipeline10.bpePairCounts(words).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m === Map(("h", "i") -> 5L, ("i", "i") -> 2L))
  }

  test("q_bpe_learn merges are distinct, positive-count, round-ordered") {
    val rows = Pipeline10.queries("q_bpe_learn")(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.forall(_.getLong(4) > 0L))
    // each merged symbol is the concatenation of its parts
    rows.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
  }

  test("q_chi2_mkt margins are consistent and contributions non-negative") {
    val rows = Pipeline10.queries("q_chi2_mkt")(spark, dir).collect()
    val grand = rows.map(_.getLong(2)).sum
    // per-segment cells sum to that segment's row_total
    rows.groupBy(_.getString(0)).foreach { case (_, cs) =>
      assert(cs.map(_.getLong(2)).sum === cs.head.getLong(3))
    }
    rows.groupBy(_.getString(1)).foreach { case (_, cs) =>
      assert(cs.map(_.getLong(2)).sum === cs.head.getLong(4))
    }
    // expected counts reproduce the grand total; contribs are >= 0
    assert(math.abs(rows.map(_.getDouble(5)).sum - grand) < 1e-6)
    assert(rows.forall(_.getDouble(6) >= 0.0))
  }

  test("q_acf stays in [-1, 1] with n_pairs = n_days - lag") {
    val rows = Pipeline10.queries("q_acf")(spark, dir).collect()
    val nDays = graft.Tables(spark, dir, "events")
      .select(to_date($"ts")).distinct().count()
    rows.foreach { r =>
      assert(r.getLong(1) === nDays - r.getLong(0))
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-12)
    }
  }

  test("q_sketch_set_ops estimates track exact cardinalities") {
    val rows = Pipeline10.queries("q_sketch_set_ops")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exu, exi) = (r.getLong(2), r.getLong(3))
      val (esu, esi, ej) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(exi <= exu)
      // k=256 → standard error ~6%; allow 4 sigma
      assert(math.abs(esu - exu) <= 0.25 * exu, s"union est $esu vs exact $exu")
      assert(ej >= 0.0 && ej <= 1.0 + 1e-12)
      assert(esi >= 0.0 && esi <= esu + 1e-9)
    }
  }

  test("q_dedup_keep_best picks the longest member of every cluster") {
    val rows = Pipeline10.queries("q_dedup_keep_best")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val canonIds = members.map(_.getLong(2)).distinct
      assert(canonIds.size === 1, "one canonical per cluster")
      val canon = members.filter(r => r.getLong(0) === canonIds.head)
      assert(canon.length === 1 && canon.head.getBoolean(3))
      // canonical has the max n_chars (doc_id tie-break: lowest id wins)
      val best = members.maxBy(r => (r.getLong(4), -r.getLong(0)))
      assert(best.getLong(0) === canonIds.head)
    }
  }

  test("q_contrastive_pairs: positive shares the label, negatives do not") {
    val rows = Pipeline10.queries("q_contrastive_pairs")(spark, dir).collect()
    assert(rows.nonEmpty)
    val labels = graft.Tables(spark, dir, "embeddings")
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)]
      .collect().toMap
    rows.foreach { r =>
      val (a, p, n1, n2) = (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(p !== a)
      assert(labels(p) === labels(a), "positive must share the anchor label")
      assert(labels(n1) !== labels(a))
      assert(labels(n2) !== labels(a))
      assert(n1 !== n2)
      assert(r.getDouble(2) <= 1.0 + 1e-9)
    }
  }
}
