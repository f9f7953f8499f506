package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Pipeline11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q_bpe_encode round-trips: concatenated tokens reproduce the word") {
    val rows = Pipeline11.queries("q_bpe_encode")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, enc, nTok) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(enc.split(' ').mkString === w, s"tokens must spell '$w'")
      assert(enc.split(' ').length.toLong === nTok)
      assert(nTok <= w.length.toLong)
    }
    // the 3 learned merges must actually compress something
    assert(rows.exists(r => r.getLong(2) < r.getString(0).length.toLong))
  }

  test("q_embed_sq8 codes stay in [0, 254] and dequantization bounds error") {
    val df = Pipeline11.queries("q_embed_sq8")(spark, dir)
    val bad = df.filter($"code" < 0L || $"code" > 254L).count()
    assert(bad === 0L)
    // |err| <= half a cell width for the dim's range (cell = (mx-mn)/255)
    val viol = df.groupBy($"dim")
      .agg((max($"v") - min($"v")).as("range"), max(abs($"err")).as("maxerr"))
      .filter($"maxerr" > $"range" / 255.0 * 0.5 + 1e-12)
      .count()
    assert(viol === 0L, "per-dim max |err| must stay within half a quant cell")
  }

  test("q_session_paths: path step counts bounded by 8, counts positive") {
    val rows = Pipeline11.queries("q_session_paths")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getString(0).split('>').length <= 8)
      assert(r.getLong(1) >= 1L)
    }
    // ranked descending
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse)
  }

  test("q_compaction_bins: bins partition each source's docs contiguously") {
    val rows = Pipeline11.queries("q_compaction_bins")(spark, dir).collect()
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.Tables(spark, dir, "documents").count())
    rows.groupBy(_.getString(0)).foreach { case (_, bins) =>
      val sorted = bins.sortBy(_.getLong(1))
      // doc-id ranges of consecutive bins must not interleave
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
        case _ =>
      }
    }
  }

  test("q_quantile_normalize preserves within-source rank order") {
    val rows = Pipeline11.queries("q_quantile_normalize")(spark, dir).collect()
    assert(rows.length === 500)
    rows.groupBy(_.getString(1)).foreach { case (_, docs) =>
      val byRank = docs.sortBy(_.getLong(3))
      // normalized values are monotone in the source-local rank
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) <= b.getLong(4))
        case _ =>
      }
    }
    // the normalized distribution is drawn from the global value set
    val globalVals = graft.Tables(spark, dir, "documents")
      .select($"n_chars").as[Long].collect().toSet
    assert(rows.forall(r => globalVals.contains(r.getLong(4))))
  }
}
