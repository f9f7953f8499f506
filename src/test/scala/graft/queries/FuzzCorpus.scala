package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Adversarial fuzz corpora shared by [[FuzzCatalogSpec]] and the
  * offline full-catalog crash sweep (`Test/runMain
  * graft.queries.FuzzCorpus <outBase>` writes all three, then point
  * `graft.Verify` at each directory to execute every catalog query over
  * hostile data). Deterministic seeds; see the spec scaladoc for what
  * each corpus stresses.
  */
object FuzzCorpus {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  def gen(spark: SparkSession, name: String, seed: Int,
      out: Option[String] = None): String = {
    val dir = out.getOrElse(Files.createTempDirectory(s"fuzz_$name").toString)
    val rnd = new Random(seed)
    val hostile = name == "hostile"
    val unicodeish = name == "unicode"

    def write(rows: Seq[Row], schema: StructType, table: String): Unit = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, schema)
        .repartition(3) // multiple partitions: empty/uneven splits happen
        .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }

    write((0 until 5).map(i => Row(i, s"R$i")),
      StructType(Seq(StructField("r_regionkey", IntegerType),
        StructField("r_name", StringType))), "region")
    write((0 until 25).map(i => Row(i, s"N$i", i % 5)),
      StructType(Seq(StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))), "nation")

    val nCust = 40
    write((0 until nCust).map { i =>
      Row(i.toLong, s"c$i", rnd.nextInt(25),
        if (hostile) (rnd.nextInt(200) - 100) * 1e6 else rnd.nextInt(1000) / 10.0,
        Seq("BUILDING", "MACHINERY", "AUTOMOBILE")(rnd.nextInt(3)))
    }, StructType(Seq(StructField("c_custkey", LongType),
      StructField("c_name", StringType), StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType), StructField("c_mktsegment", StringType))),
      "customer")

    write((0 until 10).map(i => Row(i.toLong, s"s$i", rnd.nextInt(25),
      rnd.nextInt(1000) / 10.0)),
      StructType(Seq(StructField("s_suppkey", LongType),
        StructField("s_name", StringType), StructField("s_nationkey", IntegerType),
        StructField("s_acctbal", DoubleType))), "supplier")

    write((0 until 50).map(i => Row(i.toLong, s"part $i", s"Brand#${i % 5}",
      s"TYPE ${i % 7}", 1 + rnd.nextInt(50), 1.0 + rnd.nextInt(10000) / 100.0)),
      StructType(Seq(StructField("p_partkey", LongType),
        StructField("p_name", StringType), StructField("p_brand", StringType),
        StructField("p_type", StringType), StructField("p_size", IntegerType),
        StructField("p_retailprice", DoubleType))), "part")

    // Orders: month gaps (unicode corpus drops two whole months); tied
    // totalprices; skewed custkeys.
    val months = if (unicodeish) Seq(1, 2, 5, 6, 9) else Seq(1, 2, 3, 4, 5, 6)
    val nOrd = 200
    val orders = (0 until nOrd).map { i =>
      val m = months(rnd.nextInt(months.length))
      val day = 1 + rnd.nextInt(if (unicodeish) 3 else 27) // tied days
      val cust = if (rnd.nextInt(10) < 4) 7L else rnd.nextInt(nCust).toLong
      val price = if (rnd.nextInt(4) == 0) 1000.00
        else rnd.nextInt(500000) / 100.0
      Row(i.toLong, cust, Seq("O", "F", "P")(rnd.nextInt(3)), price,
        ts(f"2024-$m%02d-$day%02d 00:00:00"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM")(rnd.nextInt(3)))
    }
    write(orders, StructType(Seq(StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType), StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType))), "orders")

    // Lineitem: one giant order (~30% of lines), tied quantities/prices,
    // discount boundaries, ship-date gaps.
    val lines = (0 until 600).map { i =>
      val ok = if (rnd.nextInt(10) < 3) 7L else rnd.nextInt(nOrd).toLong
      val qty = Seq(1.0, 1.0, 5.0, 50.0)(rnd.nextInt(4))
      val price = Seq(100.005, 0.01, 99999.99, 1234.56)(rnd.nextInt(4))
      val m = months(rnd.nextInt(months.length))
      Row(ok, rnd.nextInt(50).toLong, rnd.nextInt(10).toLong, (i % 7) + 1,
        qty, price, Seq(0.0, 0.01, 0.1)(rnd.nextInt(3)),
        Seq(0.0, 0.08)(rnd.nextInt(2)),
        Seq("A", "N", "R")(rnd.nextInt(3)), Seq("O", "F")(rnd.nextInt(2)),
        ts(f"2024-$m%02d-${1 + rnd.nextInt(27)}%02d 00:00:00"))
    }
    write(lines, StructType(Seq(StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType), StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType), StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType), StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType), StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType), StructField("l_shipdate", TimestampType))),
      "lineitem")

    // Events: negative user ids in the hostile corpus (floor-div/pmod
    // sensitivity), tied timestamps, session-boundary gaps (exactly 30
    // minutes — the > boundary), skewed users.
    val base = ts("2024-03-01 08:00:00").getTime
    val events = (0 until 400).map { i =>
      val u = if (hostile) rnd.nextInt(21) - 10 else rnd.nextInt(12)
      val stepMin = Seq(0, 0, 1, 29, 30, 31, 200)(rnd.nextInt(7))
      Row(i.toLong, new Timestamp(base + i.toLong / 4 * 60000 * stepMin),
        u.toLong, Seq("click", "view", "purchase", "error", "signup")(rnd.nextInt(5)),
        if (hostile) (rnd.nextInt(400) - 200) / 4.0 else rnd.nextInt(2000) / 4.0,
        s"""{"k": ${rnd.nextInt(100)}}""")
    }
    write(events, StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType))), "events")

    // Documents: exact duplicates, near-duplicates (one word flipped),
    // short docs (0/1/2 words), unicode.
    val bases = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "pack my box with five dozen liquor jugs before noon arrives here",
      "a b a b a b a b a b a b a b a b",
      if (unicodeish) "漢字 テスト データ 重複 検出 テスト 漢字 例 文書 です ね はい"
      else "data pipelines deduplicate documents with minhash and shingles at scale",
      if (unicodeish) "café résumé naïve déjà vu café résumé naïve déjà vu encore une fois"
      else "spark catalyst optimizer plans joins and aggregations with shuffles")
    val docs = (0 until 80).map { i =>
      val txt = rnd.nextInt(10) match {
        case 0 => "" // empty: the <3-words shingle guard
        case 1 => "singleword"
        case 2 => "two words"
        case 3 | 4 => bases(rnd.nextInt(bases.length)) // exact dup
        case 5 | 6 => // near-dup: flip one word
          val ws = bases(rnd.nextInt(bases.length)).split(" ")
          ws.updated(rnd.nextInt(ws.length), "FLIP" + rnd.nextInt(3)).mkString(" ")
        case _ => (0 until 8 + rnd.nextInt(8)).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      }
      val id = if (hostile) i.toLong - 40 else i.toLong
      Row(id, txt, Seq("en", "de", "fr", "es", "zh")(rnd.nextInt(5)),
        Seq("web", "wiki", "code")(rnd.nextInt(3)), txt.length.toLong)
    }
    write(docs, StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType))),
      "documents")

    // Embeddings: 64-dim; duplicate vectors + sign-boundary coordinates.
    val dim = 64
    val protos = (0 until 6).map(_ => Array.fill(dim)((rnd.nextDouble() - 0.5).toFloat))
    val embs = (0 until 60).map { i =>
      val v = if (rnd.nextInt(3) == 0) protos(rnd.nextInt(6)) // exact dup vectors
        else protos(rnd.nextInt(6)).map(x =>
          (x + (rnd.nextDouble() - 0.5).toFloat * 0.01f))
      Row(i.toLong, v.toSeq, rnd.nextInt(4))
    }
    write(embs, StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))), "embeddings")

    dir
  }

  def main(args: Array[String]): Unit = {
    val outBase = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("ties" -> 101, "unicode" -> 202, "hostile" -> 303).foreach {
      case (n, s) =>
        val dir = gen(spark, n, s, Some(s"$outBase/$n"))
        println(s"[fuzzcorpus] $n -> $dir")
    }
    spark.stop()
  }
}
