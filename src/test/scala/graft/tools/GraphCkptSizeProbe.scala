package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures what the graph queries' DISK_ONLY edge checkpoints actually
  * occupy on disk at a given SF — the number that decides whether the
  * graph trio fits the ×1000 corpus on this box (round-9 verdict item 3
  * said "~75 GB, over free disk" from extrapolation; this probe replaces
  * the extrapolation with a measurement).
  *
  * Also A/Bs `spark.rdd.compress` (context-level conf, so it must be set
  * at session build): DISK_ONLY blocks go through SerializerManager,
  * which applies LZ4 iff that conf is on, and (src,dst,d) long triples
  * compress well. Usage:
  *
  *   GRAFT_RDD_COMPRESS=true SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
  *     sbt "Test/runMain graft.tools.GraphCkptSizeProbe <sfDir> <query>"
  *
  * Prints per-RDD storage rows (level, mem, disk) snapshotted at the
  * moment the query's own job finishes (the checkpoints are still
  * pinned), plus wall seconds.
  */
object GraphCkptSizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scaledata/sf10")
    val q = if (args.length > 1) args(1) else "q_pagerank"
    val compress = sys.env.getOrElse("GRAFT_RDD_COMPRESS", "false")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-graph-ckpt-size-probe")
      .config("spark.rdd.compress", compress)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(q)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    val infos = spark.sparkContext.getRDDStorageInfo
    infos.foreach { i =>
      println(s"[ckpt-size] rdd=${i.id} parts=${i.numCachedPartitions}/" +
        s"${i.numPartitions} level=${i.storageLevel.description} " +
        s"mem=${i.memSize} disk=${i.diskSize} name=${i.name}")
    }
    println(f"[ckpt-size] RESULT query=$q sf=$sfDir compress=$compress " +
      f"parts=$parts wall=$sec%.1fs totalMem=${infos.map(_.memSize).sum} " +
      f"totalDisk=${infos.map(_.diskSize).sum}")
    spark.stop()
  }
}
