package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Randomized-oracle fuzzing beyond the driver's seed=42 corpus (VERDICT
  * r6 item 5). The fixed corpus never shows negative ids, adversarial
  * unicode, heavy ties, duplicate texts, or calendar gaps — the
  * q_bitmap_index negative-id bug class was caught by review, not test.
  *
  * Three deterministic corpora (fixed seeds — reproducible, no CI
  * flakes), each parquet-shaped exactly like TESTDATA.md:
  *  - "ties": massive key skew (one order holds ~30% of lines), tied
  *    prices/quantities/timestamps, duplicate and near-duplicate texts;
  *  - "unicode": CJK/emoji/combining-accent text, 0–2-word documents,
  *    single-row groups, month gaps in the order calendar;
  *  - "hostile": negative user_ids and doc_ids (floor-div/pmod paths),
  *    tiny and huge magnitudes, empty strings, duplicate embeddings.
  *
  * Two layers of checking:
  *  1. a SWEEP over a broad catalog subset: each query must execute and
  *     return the same row multiset twice (catches crashes and
  *     nondeterminism on inputs the oracle corpus can't represent);
  *  2. VALUE ORACLES: sequential in-test reimplementations (independent
  *     of the DataFrame logic under test) compared exactly, for queries
  *     whose semantics are cleanly restatable: exact dedup, n-gram
  *     Jaccard (capped and uncapped), TPC-H Q1 decimal aggregation,
  *     sessionization, and the negative-id-sensitive bitmap index.
  */
class FuzzCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---------------------------------------------------------------- data

  private val sweepQueries = Seq(
    "q1_agg", "q_agg_stats", "q_dedup_exact", "q_dedup_ngram_jaccard",
    "q_dedup_capped_shingle", "q_dedup_minhash_lsh", "q_dedup_capped_band",
    "q_minhash_sig", "q_dedup_simhash", "q_text_stats", "q_text_tokens",
    "q_text_langid", "q_token_histogram", "q_sessionize", "q_embed_knn",
    "q_embed_ann_lsh", "q_weighted_median", "q_max_drawdown",
    "q_bitmap_index", "q_asof_join", "q_range_join", "q_interval_join",
    "q_forecast_baselines", "q_runs_test", "q_price_index", "q_icc_orders",
    "q_anova_f", "q_mode_per_group", "q_gini", "q_tpch3",
    // Round-7 full-catalog sweep catches, pinned here against regression:
    "q_cuped", "q_graph_assortativity", "q_quality_signals",
    "q_schema_drift")


  private lazy val corpora: Seq[(String, String)] =
    Seq("ties" -> 101, "unicode" -> 202, "hostile" -> 303)
      .map { case (n, s) => n -> FuzzCorpus.gen(spark, n, s) }

  // --------------------------------------------------------------- sweep

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("sweep: every fuzzed query executes and is deterministic on all corpora") {
    val failures = mutable.Buffer[String]()
    for ((cname, dir) <- corpora; q <- sweepQueries) {
      try {
        val a = canon(SparkEntry.queries(q)(spark, dir))
        val b = canon(SparkEntry.queries(q)(spark, dir))
        if (a != b) failures += s"$cname/$q: nondeterministic (${a.size} rows)"
      } catch {
        case e: Throwable => failures += s"$cname/$q: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  // ------------------------------------------------------- value oracles

  private def docsOf(dir: String): Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq

  test("oracle: q_dedup_exact groups by text, min id wins, per corpus") {
    for ((cname, dir) <- corpora) {
      val got = SparkEntry.queries("q_dedup_exact")(spark, dir).collect()
        .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("n_copies"))).toSeq
      val want = docsOf(dir).groupBy(_._2).values
        .map(g => (g.map(_._1).min, g.size.toLong)).toSeq.sortBy(_._1)
      assert(got == want, s"corpus $cname")
    }
  }

  private def shingleSet(text: String): Set[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) Set.empty
    else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").toSet
  }

  /** Sequential capped/uncapped Jaccard pairs (a_id, b_id, common, n_a, n_b). */
  private def seqJaccard(docs: Seq[(Long, String)], maxDf: Int): Set[(Long, Long, Long, Long, Long)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sh.values.toSeq.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }
    val kept = sh.map { case (id, s) =>
      id -> (if (maxDf <= 0) s else s.filter(df(_) <= maxDf)) }
    val ids = docs.map(_._1).sorted
    (for {
      ai <- ids.indices.iterator; bi <- (ai + 1) until ids.length
      a = ids(ai); b = ids(bi)
      common = (kept(a) & kept(b)).size.toLong
      if common > 0
      na = sh(a).size.toLong; nb = sh(b).size.toLong
      if common * 10 >= 8 * (na + nb - common)
    } yield (a, b, common, na, nb)).toSet
  }

  test("oracle: n-gram Jaccard pairs, capped and uncapped, per corpus") {
    for ((cname, dir) <- corpora; cap <- Seq(0, 4)) {
      val q = if (cap == 0) "q_dedup_ngram_jaccard" else "q_dedup_capped_shingle"
      val got = SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Long]("common"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))).toSet
      assert(got == seqJaccard(docsOf(dir), cap), s"corpus $cname cap $cap")
    }
  }

  test("oracle: q1_agg decimal aggregation matches sequential BigDecimal") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    // Spark's double->decimal cast goes through the double's STRING
    // representation (BigDecimal.decimal) then HALF_UP — JBD.valueOf
    // mirrors that; new JBD(binary double) would round 100.005 down.
    def d2(v: Double): JBD = JBD.valueOf(v).setScale(2, RoundingMode.HALF_UP)
    for ((cname, dir) <- corpora) {
      val rows = spark.read.parquet(s"$dir/lineitem.parquet").collect()
        .filter(_.getAs[Double]("l_quantity") < 45)
      val want = rows.groupBy(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")))
        .map { case ((rf, ls), g) =>
          val n = g.length.toLong
          val sq = g.map(r => d2(r.getAs[Double]("l_quantity"))).reduce(_.add(_))
          val sp = g.map(r => d2(r.getAs[Double]("l_extendedprice"))).reduce(_.add(_))
          val sdp = g.map { r =>
            d2(r.getAs[Double]("l_extendedprice"))
              .multiply(JBD.ONE.subtract(d2(r.getAs[Double]("l_discount"))))
          }.reduce(_.add(_))
          val sd = g.map(r => d2(r.getAs[Double]("l_discount"))).reduce(_.add(_))
          (rf, ls) -> (sq.doubleValue, sp.doubleValue, sdp.doubleValue,
            sq.doubleValue / n, sp.doubleValue / n, sd.doubleValue / n, n)
        }
      val got = SparkEntry.queries("q1_agg")(spark, dir).collect()
        .map(r => (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus")) ->
          (r.getAs[Double]("sum_qty"), r.getAs[Double]("sum_base_price"),
            r.getAs[Double]("sum_disc_price"), r.getAs[Double]("avg_qty"),
            r.getAs[Double]("avg_price"), r.getAs[Double]("avg_disc"),
            r.getAs[Long]("count_order"))).toMap
      assert(got == want, s"corpus $cname")
    }
  }

  test("oracle: sessionize splits strictly-over-30-minute gaps sequentially") {
    for ((cname, dir) <- corpora) {
      val ev = spark.read.parquet(s"$dir/events.parquet").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("ts"),
          r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      val want = ev.groupBy(_._1).flatMap { case (u, g) =>
        val sorted = g.sortBy(e => (e._2.getTime, e._3))
        var idx = 0L
        var prev: Option[Long] = None
        val out = sorted.map { e =>
          val us = e._2.getTime * 1000
          if (prev.isEmpty || us - prev.get > 30L * 60 * 1000000) idx += 1
          prev = Some(us)
          (u, idx, e)
        }
        out.groupBy(t => (t._1, t._2)).map { case ((uu, si), es) =>
          val vs = es.map(_._3)
          import java.math.{BigDecimal => JBD, RoundingMode}
          val tot = vs.map(v => JBD.valueOf(v._4).setScale(2, RoundingMode.HALF_UP))
            .reduce(_.add(_)).doubleValue
          (uu, si) -> (vs.length.toLong, tot)
        }
      }
      val got = SparkEntry.queries("q_sessionize")(spark, dir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      assert(got == want.toMap, s"corpus $cname")
    }
  }

  test("oracle: bitmap index handles negative ids (floor-div buckets)") {
    for ((cname, dir) <- corpora) {
      val ev = spark.read.parquet(s"$dir/events.parquet").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
      val want = ev.groupBy(_._1).map { case (et, g) =>
        val users = g.map(_._2).distinct
        val words = users.groupBy(u => Math.floorDiv(u, 63L)).map { case (_, us) =>
          us.map(u => 1L << Math.floorMod(u, 63L).toInt).reduce(_ | _)
        }
        et -> (words.size.toLong, words.map(java.lang.Long.bitCount(_).toLong).sum,
          users.length.toLong)
      }
      val got = SparkEntry.queries("q_bitmap_index")(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") ->
          (r.getAs[Long]("n_words"), r.getAs[Long]("bitmap_distinct"),
            r.getAs[Long]("exact_distinct"))).toMap
      assert(got == want, s"corpus $cname")
      got.foreach { case (et, (_, bm, ex)) =>
        assert(bm == ex, s"$cname/$et: bitmap distinct must be exact") }
    }
  }
}
