package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc timing probe for the q_bfs_hops edge build (not a test). */
object BfsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEngine.session("local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (round <- 1 to 3) {
      val li = graft.Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edgePlan = li.groupBy(col("ok")).agg(collect_list(col("pk")).as("pks"))
        .select(explode(col("pks")).as("src"), col("pks"))
        .select(col("src"), explode(col("pks")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .repartition(col("src"))
        .groupBy(col("src"), col("dst")).agg(lit(1).as("one"))
        .select(col("src"), col("dst"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val edges = time(s"r$round edges-checkpoint")(edgePlan.localCheckpoint())
      time(s"r$round bfs-rest") {
        var frontier = edges.select(col("src").as("node"))
          .where(col("node") < 100).distinct()
          .withColumn("hop", lit(0L)).localCheckpoint()
        val acc = scala.collection.mutable.ArrayBuffer(frontier)
        for (h <- 1 to 3) {
          frontier = edges
            .join(frontier.hint("shuffle_hash"), edges("src") === frontier("node"))
            .select(col("dst").as("node")).distinct()
            .withColumn("hop", lit(h.toLong))
          if (h < 3) frontier = frontier.localCheckpoint()
          acc += frontier
        }
        acc.reduce(_ union _)
          .groupBy(col("node").as("part_key"))
          .agg(min(col("hop")).as("hop"))
          .orderBy(col("part_key"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
