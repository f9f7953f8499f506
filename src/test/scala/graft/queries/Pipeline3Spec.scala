package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.BloomFunctions

/** Algorithm specs for the passage-dedup / decontamination /
  * bloom-ingest batch (the DuckDB oracle checks engine parity on the
  * harness tables; these check the algorithms and the bloom pruning
  * guarantees on crafted corpora).
  */
class Pipeline3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("bloom filter: no false negatives, and actually prunes") {
    val corpus = (1 to 1000).map(i => s"passage number $i").toDF("p")
    val probeHit = (1 to 1000 by 7).map(i => s"passage number $i").toDF("p")
    val probeMiss = (1 to 2000).map(i => s"absent text $i").toDF("p")
    val bf = BloomFunctions.build(corpus, col("p"), 10000L, 80000L)
    // every true member passes the screen (bloom guarantee)
    assert(probeHit.filter(BloomFunctions.mightContain(bf, col("p"))).count()
      === probeHit.count())
    // and the screen rejects the overwhelming majority of non-members
    val passed = probeMiss.filter(BloomFunctions.mightContain(bf, col("p"))).count()
    assert(passed < 100, s"bloom passed $passed of 2000 non-members")
  }

  test("bloom over an empty corpus rejects every probe (no null poisoning)") {
    val empty = Seq.empty[String].toDF("p")
    val bf = BloomFunctions.build(empty, col("p"), 100L, 800L)
    assert(bf != null)
    val probes = Seq("a", "b").toDF("p")
    assert(probes.filter(BloomFunctions.mightContain(bf, col("p"))).count() === 0)
    assert(probes.filter(!BloomFunctions.mightContain(bf, col("p"))).count() === 2)
  }

  test("q_dedup_bloom matches the naive exact join (bloom is invisible)") {
    val got = graft.SparkEntry.queries("q_dedup_bloom")(spark, dir)
      .select("doc_id", "n_passages", "n_dup")
      .as[(Long, Long, Long)].collect().toSet
    // naive twin: same passage split, plain left join, no bloom
    val p = graft.Tables(spark, dir, "documents").select(
      col("doc_id"),
      explode(expr(
        "transform(sequence(0, CAST((size(split(text, ' ')) + 9) DIV 10 AS INT) - 1), " +
          "i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))")).as("passage"))
    val corpus = p.filter(col("doc_id") % 5 =!= 4).select("passage").distinct()
      .withColumn("hit", lit(1L))
    val want = p.filter(col("doc_id") % 5 === 4)
      .join(corpus, Seq("passage"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0L))).as("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("passage dedup keeps exactly the first occurrence of each passage") {
    val out = graft.SparkEntry.queries("q_passage_dedup")(spark, dir)
      .select("doc_id", "n_passages", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // replay keep-first sequentially on the driver
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    val expect = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      val ps = ws.grouped(10).map(_.mkString(" ")).toSeq
      val kept = ps.filter(seen.add)
      (id, ps.size.toLong, (ps.size - kept.size).toLong, kept.mkString(" "))
    }
    assert(out.toSeq === expect.toSeq)
    assert(expect.map(_._3).sum > 0, "fixture has no duplicate passages")
  }

  test("mix budget: kept docs are the maximal md5-ordered prefix within budget") {
    val kept = graft.SparkEntry.queries("q_mix_budget")(spark, dir)
      .select("source", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect()
    assert(kept.nonEmpty)
    assert(kept.forall(_._3 <= 600))
    // replay: per source the kept set must be exactly the prefix of the
    // md5-ordered doc list whose running token total stays <= 600
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"),
        md5(col("doc_id").cast("string")).as("h"))
      .as[(String, Long, Long, String)].collect()
    val expectPrefix = docs.groupBy(_._1).flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (d._4, d._2))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).filter(_._2 <= 600)
        .map { case (d, c) => (src, d._2, c) }.toSeq
    }.toSet
    assert(kept.toSet === expectPrefix)
  }

  test("k-anonymity: rare QI groups suppress, common ones survive") {
    val rows = graft.SparkEntry.queries("q_kanon")(spark, dir)
      .select("nation_qi", "segment_qi", "qi_n")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nat, seg, n) =>
      if (n < 5) assert(nat === "*" && seg === "*", s"group of $n not suppressed")
      else assert(nat != "*" && seg != "*", s"group of $n wrongly suppressed")
    }
    // every surviving QI group really has >= 5 members in the output
    val sizes = rows.filter(_._1 != "*").groupBy(r => (r._1, r._2))
    sizes.foreach { case (qi, rs) =>
      assert(rs.length >= 5, s"$qi appears ${rs.length} times")
    }
  }

  test("intra-doc dedup collapses repeats within a doc, never across docs") {
    val out = graft.SparkEntry.queries("q_intradoc_dedup")(spark, dir)
      .select("doc_id", "n_passages", "n_dropped", "text_clean")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val expect = docs.map { case (id, text) =>
      val ps = text.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
      val seen = scala.collection.mutable.Set[String]() // per-doc state
      val kept = ps.filter(seen.add)
      (id, ps.size.toLong, (ps.size - kept.size).toLong, kept.mkString(" "))
    }
    assert(out.toSeq === expect.toSeq)
  }

  test("containment is asymmetric: the quote is contained, the host is not") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "intro words alpha beta gamma delta epsilon and then a much longer tail of unrelated content"),
      (3L, "totally different text about nothing shared at all here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, t10 = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"quote not detected: $pairs") // 1 ⊂ 2
    assert(!pairs.contains((2L, 1L)), "host wrongly contained in quote")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("decontamination flags exactly the docs sharing a 5-gram with eval") {
    val out = graft.SparkEntry.queries("q_decontaminate")(spark, dir)
      .select("doc_id", "n_shared").as[(Long, Long)].collect().toMap
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def sh(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < 5) Set.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
    }
    val evalSh = docs.filter(_._1 % 50 == 0).flatMap(d => sh(d._2)).toSet
    val expect = docs.filter(_._1 % 50 != 0)
      .map(d => d._1 -> sh(d._2).count(evalSh.contains).toLong).toMap
    assert(out === expect)
  }
}
