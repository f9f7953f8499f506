package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Algorithm specs for the mixture-assembly batch (packing, chunking,
  * splitting, redaction, quality gate, outlier screen, curriculum). The
  * DuckDB oracle checks engine parity on the harness tables; these check
  * the invariants that make the operators correct — coverage, partition
  * completeness, determinism — on crafted and harness corpora.
  */
class Pipeline4Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** documents table with one doc per given token count, all one source. */
  private def docsDir(tokenCounts: Seq[Int]): String = {
    val d = Files.createTempDirectory("p4docs").toString
    tokenCounts.zipWithIndex.map { case (n, i) =>
      val text = (0 until n).map(k => s"w${i}_$k").mkString(" ")
      (i.toLong, text, "en", "src0", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q_pack_sequences: blocks partition the stream, in order, 512-aligned") {
    // 100+300+200+500+40+600 tokens → cum 100,400,600,1100,1140,1740
    // start offsets 0,100,400,600,1100,1140 → blocks 0,0,0,1,2,2
    val d = docsDir(Seq(100, 300, 200, 500, 40, 600))
    val rows = Pipeline4.queries("q_pack_sequences")(spark, d)
      .select("block_id", "n_docs", "block_tokens", "first_doc", "last_doc")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(rows === List((0L, 3L, 600L, 0L, 2L), (1L, 1L, 500L, 3L, 3L),
      (2L, 2L, 640L, 4L, 5L)))
    // partition completeness: every doc in exactly one block
    assert(rows.map(_._2).sum === 6L)
    assert(rows.map(_._3).sum === 1740L)
  }

  test("q_chunk_overlap: full coverage, stride-5 starts, no pure-suffix tail") {
    // n=7 → 1 chunk; n=10 → 1; n=12 → 2; n=23 → 4 (starts 0,5,10,15)
    val d = docsDir(Seq(7, 10, 12, 23))
    val rows = Pipeline4.queries("q_chunk_overlap")(spark, d)
      .select("doc_id", "chunk_idx", "chunk", "n_chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toList
    val byDoc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(0L).map(_._4) === List(7L))
    assert(byDoc(1L).map(_._4) === List(10L))
    assert(byDoc(2L).map(_._4) === List(10L, 7L))
    assert(byDoc(3L).map(_._4) === List(10L, 10L, 10L, 8L))
    // coverage: the union of a doc's chunk tokens is exactly its tokens
    for ((id, chunks) <- byDoc) {
      val n = Seq(7, 10, 12, 23)(id.toInt)
      val want = (0 until n).map(k => s"w${id}_$k").toSet
      assert(chunks.flatMap(_._3.split(" ")).toSet === want, s"doc $id coverage")
      // stride alignment: chunk i starts at token i*5
      chunks.foreach { case (_, i, c, _) =>
        assert(c.startsWith(s"w${id}_${i * 5} ") || c === s"w${id}_${i * 5}" ||
          c.split(" ").head === s"w${id}_${i * 5}")
      }
    }
  }

  test("q_split_assign: splits partition the corpus and are deterministic") {
    val a = Pipeline4.queries("q_split_assign")(spark, dir).collect()
    val b = Pipeline4.queries("q_split_assign")(spark, dir).collect()
    assert(a.toSeq === b.toSeq, "hash split must be run-to-run stable")
    val total = a.map(_.getLong(2)).sum
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(total === nDocs, "every doc lands in exactly one (source, split)")
    // uniform md5 buckets: train ≈ 75% (loose bounds; 50 docs at sf0.001)
    val trainFrac = a.filter(_.getString(1) == "train").map(_.getLong(2)).sum
      .toDouble / total
    assert(trainFrac > 0.5 && trainFrac < 0.95, s"train fraction $trainFrac")
  }

  test("q_pii_redact: every planted identifier is found and scrubbed") {
    val rows = Pipeline4.queries("q_pii_redact")(spark, dir)
      .select("redacted", "n_emails", "n_phones", "n_ips")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (red, ne, np, ni) =>
      assert(ne === 1L && np === 1L && ni === 1L)
      assert(!red.contains("@"), s"email survived: $red")
      assert(!red.contains("555-"), s"phone survived: $red")
      assert(!red.matches(".*[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+.*"), s"ip survived: $red")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]") && red.contains("[IP]"))
    }
  }

  test("q_quality_filter: flags are consistent with the raw signals") {
    val rows = Pipeline4.queries("q_quality_filter")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, wl, ttr, ns) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(r.getBoolean(5) === (nw >= 10 && nw <= 1000))
      assert(r.getBoolean(6) === (wl >= 2.0 && wl <= 12.0))
      assert(r.getBoolean(7) === (ns >= 1))
      assert(r.getBoolean(8) === (ttr >= 0.2))
      assert(r.getBoolean(9) === (r.getBoolean(5) && r.getBoolean(6) &&
        r.getBoolean(7) && r.getBoolean(8)))
    }
  }

  test("q_outliers: matches a driver-side naive z-score at 1e-9") {
    val vals = graft.Tables(spark, dir, "events")
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect()
    val byType = vals.groupBy(_._2)
    val want = byType.toSeq.flatMap { case (_, rows) =>
      val n = rows.length
      // mirror the exact-decimal route: 2-decimal values are exact in cents
      val cents = rows.map(r => math.rint(r._3 * 100).toLong)
      val sum = cents.sum / 100.0
      val sumsq = cents.map(c => c * c).sum / 10000.0
      val mean = sum / n
      val std = math.sqrt((sumsq - sum * sum / n) / (n - 1))
      rows.flatMap { case (id, _, v) =>
        val z = BigDecimal((v - mean) / std)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(z) >= 2.5) Some(id -> z) else None
      }
    }.toMap
    val got = Pipeline4.queries("q_outliers")(spark, dir)
      .select("event_id", "z").as[(Long, Double)].collect().toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, z) => assert(math.abs(got(id) - z) < 1e-9, s"event $id") }
  }

  test("q_curriculum: four balanced tiles with ascending boundaries") {
    val rows = Pipeline4.queries("q_curriculum")(spark, dir)
      .select("source", "tile", "n_docs", "min_chars", "max_chars")
      .as[(String, Long, Long, Long, Long)].collect().toList
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val sorted = ts.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length).toList, s"$src tiles")
      // NTILE balance: bucket sizes differ by at most one
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src sizes $sizes")
      // boundaries ascend: tile t's max ≤ tile t+1's min
      sorted.sliding(2).foreach {
        case List(a, b) => assert(a._5 <= b._4, s"$src: ${a._5} > ${b._4}")
        case _ =>
      }
    }
  }
}
