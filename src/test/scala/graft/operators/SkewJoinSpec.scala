package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of fact rows share one hot key.
  private lazy val fact = (1 to 200).map { i =>
    (if (i <= 180) 1L else i.toLong, s"v$i")
  }.toDF("k", "payload")
  private lazy val dim = Seq((1L, "hot"), (190L, "cold")).toDF("k", "name")

  test("salted join returns exactly the rows of the plain join") {
    val plain = fact.join(dim, "k").select($"k", $"payload", $"name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedInner(fact, dim, "k", salts = 8)
      .select($"k", $"payload", $"name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length === 181)
    assert(salted === plain)
  }

  test("hot key spreads across multiple shuffle partitions") {
    val salted = fact.withColumn("__salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(fact.columns.map(fact(_)).toIndexedSeq: _*),
        org.apache.spark.sql.functions.lit(8)))
    val spread = salted.filter($"k" === 1L).select($"__salt").distinct().count()
    assert(spread > 1, s"expected hot key in >1 salt bucket, got $spread")
  }
}
