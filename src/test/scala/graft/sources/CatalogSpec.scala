package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SQL-catalog face of the engine: named tables and views over the
  * same DataFrames, driven through `spark.sql` text — what a SQL-first
  * user of the engine actually touches. Session-catalog tables here
  * (in-memory catalog, parquet under spark.sql.warehouse.dir); the
  * DataFrame surface everywhere else is identical.
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saveAsTable + SQL text + catalog listing round-trip") {
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .write.mode("overwrite").saveAsTable("cat_docs")
    val n = spark.sql("SELECT COUNT(*) FROM cat_docs WHERE lang = 'en'")
      .as[Long].head()
    assert(n === 2L)
    assert(spark.catalog.tableExists("cat_docs"))
    assert(spark.catalog.listColumns("cat_docs").collect()
      .map(_.name).toSet === Set("id", "lang"))
    spark.sql("DROP TABLE cat_docs")
    assert(!spark.catalog.tableExists("cat_docs"))
  }

  test("temp and global-temp views resolve in SQL with injected functions") {
    graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .createOrReplaceTempView("v_docs")
    // The GraftExtensions-registered SQL functions work through views.
    val est = spark.sql(
      "SELECT graft_kmv(CAST(doc_id AS STRING), 4096) FROM v_docs")
      .as[Double].head()
    assert(est === 500.0) // below k → exact distinct count
    spark.range(5).createOrReplaceGlobalTempView("gv_ids")
    assert(spark.sql("SELECT COUNT(*) FROM global_temp.gv_ids")
      .as[Long].head() === 5L)
  }

  test("INSERT INTO appends through the catalog") {
    Seq((1L, 10.0)).toDF("k", "v").write.mode("overwrite").saveAsTable("cat_ins")
    spark.sql("INSERT INTO cat_ins VALUES (2, 20.0), (3, 30.0)")
    assert(spark.table("cat_ins").count() === 3)
    spark.sql("DROP TABLE cat_ins")
  }
}
