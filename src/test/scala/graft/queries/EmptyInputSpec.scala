package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Robustness gate: the catalog must degrade gracefully on empty inputs
  * — no NPEs, no division-by-zero crashes, no "next on empty iterator".
  * A production pipeline regularly sees empty partitions (a fresh date
  * partition, a filter that matched nothing, a source backfill gap);
  * an engine whose operators throw on them is not shippable.
  *
  * The fixture is a zero-row copy of every table with the schema
  * preserved (limit(0) through the same loaders, so `events` keeps its
  * rebuilt timestamp column).
  */
class EmptyInputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { name =>
      Tables(spark, "/root/testdata/sf0.001", name)
        .limit(0).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir
  }

  // One representative per family: scan/agg, top-k sort, windows,
  // joins, dedup (minhash + clustering), similarity, sketches, text,
  // tokenizer, graph, time-series, statistics, sampling, layout.
  private val representatives = Seq(
    "q1_agg", "q_preview", "q_sort_limit", "q_window_funcs",
    "q_join_nation_rev", "q_semi_anti", "q_dedup_exact",
    "q_dedup_minhash_lsh", "q_dedup_clusters", "q_embed_knn",
    "q_approx_sketches", "q_heavy_hitters", "q_text_stats",
    "q_bpe_learn", "q_bpe_doc_tokens", "q_graph_degrees",
    "q_common_neighbors", "q_sessionize", "q_acf", "q_gini",
    "q_chi2_mkt", "q_sketch_set_ops", "q_sample_stratified",
    "q_compaction_bins", "q_quantile_normalize", "q_weighted_median",
    "q_benford", "q_seasonal_index", "q_mode_per_group",
    "q_contrastive_pairs", "q_session_paths", "q_embed_sq8")

  test("representative queries return cleanly (mostly empty) on zero-row tables") {
    val failures = representatives.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, emptyDir).collect()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, "queries must not throw on empty inputs:\n" +
      failures.mkString("\n"))
  }
}
