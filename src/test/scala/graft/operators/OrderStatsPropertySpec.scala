package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.TestSpark

/** Adversarial property coverage for OrderStats.running: every output —
  * row number, ascending/descending cumulative sums, exclusive running
  * max, fused running-max-of-running-sum, derived columns and their
  * chained cumulatives — must equal a sequential in-test oracle over the
  * totally-ordered frame, for ANY input partitioning. Hostile shapes:
  * sort-key ties straddling partition boundaries (tiebreaker included in
  * the sort, as the operator contract requires), null values in every
  * aggregated column, all-null columns, empty partitions (more input
  * partitions than rows), a single row, and negative keys/values. Both
  * the range-shuffle path and the boundedInput single-partition path are
  * checked against the same oracle.
  */
object OrderStatsPropertySpec extends Properties("orderstats") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("a", LongType, nullable = true),
    StructField("b", LongType, nullable = true)))

  // Few distinct keys => ties are the norm, and with many partitions they
  // straddle range boundaries. Values include negatives so running maxes
  // of partial sums can decrease.
  private val cases = for {
    n <- Gen.oneOf(0, 1, 2, 7, 97, 500)
    nKeys <- Gen.oneOf(1, 3, 50)
    parts <- Gen.oneOf(1, 5, 32, 64) // 64 > some n => empty partitions
    allNullA <- Gen.oneOf(true, false)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(-nKeys.toLong, nKeys.toLong)
      a <- Gen.option(Gen.chooseNum(-1000L, 1000L))
      b <- Gen.option(Gen.chooseNum(-50L, 50L))
    } yield (k, if (allNullA) None else a, b))
    bounded <- Gen.oneOf(true, false)
  } yield (rows.zipWithIndex.map { case ((k, a, b), i) => (i.toLong, k, a, b) },
    parts, bounded)

  private def boxed(o: Option[Long]): java.lang.Long =
    o.map(Long.box).orNull

  property("all fused outputs match a sequential oracle") =
    forAllNoShrink(cases) { case (rows, parts, bounded) =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (id, k, a, b) =>
            Row(id, k, boxed(a), boxed(b)) }, math.max(parts, 1)),
        schema)
      val got = OrderStats.running(df, Seq(col("k"), col("id")), Some("rn"),
          cumLong = Seq("a" -> "ca"),
          maxExcl = Seq("b" -> "mb"),
          cumDesc = Seq("a" -> "da"),
          cumMaxOfCum = Seq(("a", "va", "pa")),
          derived = Seq("h" -> ((r: Row) => {
            // A derived value exercising several first-level outputs,
            // including a nullable one; null on a data-driven predicate.
            val da = r.getAs[Long]("da")
            if (r.getAs[Long]("rn") % 2 == 1 && da != 0)
              Long.box(r.getAs[Long]("ca") * 7 / da)
            else null
          })),
          derivedCum = Seq("h" -> "ch"),
          boundedInput = bounded)
        .collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("rn"), r.getAs[Long]("ca"),
            r.getAs[java.lang.Long]("mb"), r.getAs[Long]("da"),
            r.getAs[Long]("va"), r.getAs[java.lang.Long]("pa"),
            r.getAs[java.lang.Long]("h"), r.getAs[Long]("ch")))
        .toMap

      // Sequential oracle over the total order (k, id).
      val ordered = rows.sortBy(t => (t._2, t._1))
      val totalA = ordered.iterator.map(_._3.getOrElse(0L)).sum
      var rn = 0L; var ca = 0L; var ascExcl = 0L; var va = 0L; var ch = 0L
      var mb: java.lang.Long = null; var pa: java.lang.Long = null
      val want = ordered.map { case (id, _, a, b) =>
        rn += 1
        ca += a.getOrElse(0L)
        val mbOut = mb
        b.foreach { v => if (mb == null || v > mb) mb = Long.box(v) }
        val da = totalA - ascExcl
        ascExcl += a.getOrElse(0L)
        va += a.getOrElse(0L)
        val paOut = pa
        if (pa == null || va > pa) pa = Long.box(va)
        val h: java.lang.Long =
          if (rn % 2 == 1 && da != 0) Long.box(ca * 7 / da) else null
        if (h != null) ch += h
        id -> (rn, ca, mbOut, da, va, paOut, h, ch)
      }.toMap

      val ok = got == want
      if (!ok) {
        val bad = want.keys.filter(k => got.get(k) != want.get(k)).take(3)
        println(s"MISMATCH parts=$parts bounded=$bounded n=${rows.size}: " +
          bad.map(k => s"id=$k got=${got.get(k)} want=${want.get(k)}").mkString("; "))
      }
      ok
    }
}
