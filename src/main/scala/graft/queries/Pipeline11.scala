package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Qs._

/** Eleventh batch: the export-side companions of the tokenizer and
  * vector families plus storage-layout planning — BPE encoding (apply
  * the learned merges), int8 scalar quantization of embeddings with
  * per-dimension reconstruction error, session path mining, a
  * small-file compaction (bin-packing) planner, and cross-source
  * quantile normalization.
  *
  * Scale design:
  *  - BPE encode replays [[Pipeline10]]'s merge learning (vocabulary-
  *    sized state, 1-row argmax broadcasts) and applies the merges to
  *    the word table, never re-walking documents: token counts per doc
  *    would then be one join from word → (doc, count) — the word table
  *    IS the unit of tokenizer work at any corpus size.
  *  - Scalar quantization needs one tiny aggregate (per-dimension
  *    min/max — |dims| rows, broadcast back) and rewrites each value
  *    independently; the error report keeps the (vec, dim) grain so no
  *    unordered double accumulation exists anywhere.
  *  - Session paths reuse the gap-sessionization recipe (two window
  *    passes), cap the path at the first 8 events BEFORE the ordered
  *    string-agg materializes anything, and aggregate paths — the
  *    result grain is |distinct paths|, not |events|.
  *  - The compaction planner is a per-source running sum (one window)
  *    assigning documents to ≤ target-byte bins by exclusive offset
  *    division — the OPTIMIZE/file-compaction shape: deciding the
  *    output file layout costs one shuffle by source, not a read of
  *    the payloads.
  *  - Quantile normalization is rank arithmetic: per-source ranks and
  *    the global rank table are both integer row_numbers, the target
  *    index is exact BIGINT math (no double quantiles), and the value
  *    lookup is an equi-join on rank — three shuffles total at any
  *    scale, all on integers.
  */
object Pipeline11 {

  val queries: Map[String, Q] = Map(
    // Apply the 3 learned BPE merges to the vocabulary: each word's
    // final token sequence, token count, and corpus frequency — the
    // encode step a tokenizer ships after training.
    "q_bpe_encode" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      var words = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w").rlike("^[a-z]+$") && length(col("w")).between(2, 20))
        .groupBy(col("w")).agg(count(lit(1)).cast("long").as("n"))
        .select(col("w"), col("n"),
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            .as("toks"))
      (1 to 3).foreach { _ =>
        val best = Pipeline10.bpePairCounts(words)
          .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        words = Pipeline10.bpeMerge(words, best)
      }
      words.select(col("w"), array_join(col("toks"), " ").as("encoded"),
          size(col("toks")).cast("long").as("n_tokens"), col("n"))
        .orderBy(col("w"))
    },

    // Int8-style scalar quantization of the embedding table: global
    // per-dimension [min, max] → 255 uniform cells, code = floor cell
    // index, dequantized midpoint, signed error. (vec, dim) grain so
    // every double is a single-expression computation, never a sum.
    "q_embed_sq8" -> { (s, dir) =>
      val vd = t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
            .as(Seq("dim", "v")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"), col("v"))
      val stats = vd.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      vd.join(broadcast(stats), "dim")
        .withColumn("code",
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(least(lit(254.0),
              floor((col("v") - col("mn")) / (col("mx") - col("mn")) * 255.0))
              .cast("long")))
        .withColumn("deq",
          col("mn") + (col("code").cast("double") + 0.5) *
            ((col("mx") - col("mn")) / 255.0))
        .select(col("vec_id"), col("dim"), col("v"), col("code"),
          col("deq"), (col("v") - col("deq")).as("err"))
        .orderBy(col("vec_id"), col("dim"))
    },

    // Session path mining: 30-min-gap sessions, path = first 8 event
    // types in time order joined by '>', ranked by session count.
    "q_session_paths" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("session_idx"))
            .orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") <= 8)
      ev.groupBy(col("user_id"), col("session_idx"))
        .agg(expr("array_join(transform(array_sort(collect_list(" +
          "struct(rn, event_type))), x -> x.event_type), '>')").as("path"))
        .groupBy(col("path"))
        .agg(count(lit(1)).cast("long").as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },

    // Compaction planner: pack each source's documents (doc_id order)
    // into ~2000-char bins by exclusive running offset — the layout an
    // OPTIMIZE/small-file-compaction pass would write.
    "q_compaction_bins" -> { (s, dir) =>
      val target = 2000L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("offset", coalesce(sum(col("n_chars")).over(w), lit(0L)))
        .withColumn("bin", floor(col("offset") / target).cast("long"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("source"), col("bin"))
    },

    // Cross-source quantile normalization of document lengths: replace
    // each doc's n_chars with the global value at its within-source
    // quantile. Target index in exact BIGINT arithmetic:
    // idx = ceil((2r-1)·N / (2·n_s)), clamped to [1, N].
    "q_quantile_normalize" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = docs
        .withColumn("r", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id")))
          .cast("long"))
        .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
      // Global value ladder via the range-partitioned two-phase rank
      // (ties interchangeable: the join consumes only norm_chars).
      val global = graft.operators.OrderStats.running(
        docs.select(col("n_chars").as("norm_chars")),
        Seq(col("norm_chars")), Some("gr"))
      val n = global.agg(count(lit(1)).cast("long").as("nn"))
      ranked.crossJoin(broadcast(n))
        .withColumn("idx",
          least(col("nn"), greatest(lit(1L),
            expr("((2 * r - 1) * nn + 2 * ns - 1) div (2 * ns)"))))
        .join(global, col("idx") === col("gr"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("r"),
          col("norm_chars"))
        .orderBy(col("doc_id"))
    })

  val oracle: Map[String, String] = Map(
    "q_bpe_encode" ->
      s"""WITH w0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
         |    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$') AND LEN(w) BETWEEN 2 AND 20
         |  GROUP BY w),
         |t0 AS (SELECT w, n, list_transform(generate_series(1, LEN(w)),
         |    i -> SUBSTR(w, i, 1)) AS toks FROM w0),
         |${Pipeline11.bpeEncodeRoundSql(1, "t0")},
         |${Pipeline11.bpeEncodeRoundSql(2, "t1")},
         |${Pipeline11.bpeEncodeRoundSql(3, "t2")}
         |SELECT w, array_to_string(toks, ' ') AS encoded,
         |  CAST(LEN(toks) AS BIGINT) AS n_tokens, n
         |FROM t3 ORDER BY w""".stripMargin,
    "q_embed_sq8" ->
      """WITH vd AS (SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
        |    CAST(emb[i] AS DOUBLE) AS v FROM (
        |      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |    UNNEST(generate_series(1, LEN(emb))) AS t(i)),
        |st AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM vd GROUP BY dim),
        |q AS (SELECT vec_id, vd.dim, v, mn, mx,
        |    CASE WHEN mx = mn THEN 0
        |      ELSE CAST(LEAST(254.0, FLOOR((v - mn) / (mx - mn) * 255.0)) AS BIGINT)
        |    END AS code
        |  FROM vd JOIN st ON vd.dim = st.dim),
        |d AS (SELECT vec_id, dim, v, code,
        |    mn + (CAST(code AS DOUBLE) + 0.5) * ((mx - mn) / 255.0) AS deq
        |  FROM q)
        |SELECT vec_id, dim, v, code, deq, v - deq AS err
        |FROM d ORDER BY vec_id, dim""".stripMargin,
    "q_session_paths" ->
      """WITH e AS (SELECT *, LAG(epoch_us(ts), 1) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us FROM events),
        |f AS (SELECT *, CASE WHEN prev_us IS NULL
        |    OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM f),
        |h AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
        |    ORDER BY ts, event_id) AS rn FROM g),
        |p AS (SELECT user_id, session_idx,
        |    STRING_AGG(event_type, '>' ORDER BY rn) AS path
        |  FROM h WHERE rn <= 8 GROUP BY user_id, session_idx)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    "q_compaction_bins" ->
      """WITH o AS (SELECT source, doc_id, n_chars,
        |    COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM documents)
        |SELECT source, CAST(FLOOR(off / 2000) AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM o GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
    "q_quantile_normalize" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        |  FROM documents),
        |g AS (SELECT n_chars AS norm_chars,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_chars) AS BIGINT) AS gr
        |  FROM documents),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
        |x AS (SELECT doc_id, source, n_chars, r,
        |    LEAST(nn, GREATEST(1,
        |      ((2 * r - 1) * nn + 2 * ns - 1) // (2 * ns))) AS idx
        |  FROM r, n)
        |SELECT doc_id, source, n_chars, r, norm_chars
        |FROM x JOIN g ON idx = gr ORDER BY doc_id""".stripMargin)

  /** DuckDB fragment for one encode-side BPE round — identical to
    * [[Pipeline10.bpeRoundSql]] but the token CTEs carry the word.
    */
  private[queries] def bpeEncodeRoundSql(r: Int, prev: String): String =
    s"""p$r AS (SELECT p.a AS a, p.b AS b, CAST(SUM(n) AS BIGINT) AS cnt FROM (
       |    SELECT n, UNNEST(list_transform(generate_series(1, len(toks) - 1),
       |      i -> {'a': toks[i], 'b': toks[i + 1]})) AS p
       |    FROM $prev) GROUP BY p.a, p.b),
       |m$r AS (SELECT a AS ma, b AS mb FROM p$r
       |  ORDER BY cnt DESC, a, b LIMIT 1),
       |t$r AS (SELECT w, n, list_reduce(list_transform(toks, t -> [t]),
       |    (acc, x) -> CASE WHEN acc[-1] = ma AND x[1] = mb
       |      THEN acc[1:len(acc) - 1] || [ma || mb] ELSE acc || x END) AS toks
       |  FROM $prev, m$r)""".stripMargin
}
