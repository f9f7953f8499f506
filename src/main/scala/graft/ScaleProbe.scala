package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Scale-knob probe (round 7; settled round 8): times the ANN operators
  * at two knob settings side by side on the same data, so sizing rules
  * are measured instead of argued.
  *
  * Round 7 used it to show FIXED knobs (nCells=16, bits=8) go quadratic
  * at 30× corpus; round 8 used it to pick between nCells ∝ N (29.4s at
  * 30×, assignment-pass quadratic) and nCells = √N (6.7s, the classic
  * balance) — and then moved the winning rules INTO the gated catalog
  * queries (`Similarity.scaledCells` / `scaledBits`, oracle-mirrored),
  * so the probe is now regression tooling rather than the only evidence.
  *
  * Usage: `runMain graft.ScaleProbe <sfDir> <fixedCells> <scaledCells>
  *   <fixedBits> <scaledBits>`
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val fixedCells = args(1).toInt
    val scaledCells = args(2).toInt
    val fixedBits = args(3).toInt
    val scaledBits = args(4).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // See SparkEngine: default-128 ObjectHashAggregate fallback sorts
      // the whole stream under any real per-group top-k key domain.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Similarity.withNorm(Tables(spark, dir, "embeddings"))

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // Warm the JVM/codegen once so the comparisons are warm-vs-warm.
    Similarity.ivfKnn(e, nCells = fixedCells, k = 3, iters = 0, nprobe = 1)
      .write.format("noop").mode("overwrite").save()
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = false))

    for ((label, cells) <- Seq("ivf_fixed" -> fixedCells, "ivf_scaled" -> scaledCells)) {
      time(s"$label cells=$cells") {
        Similarity.ivfKnn(e, nCells = cells, k = 3, iters = 2, nprobe = 2)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    for ((label, bits) <- Seq("lsh_fixed" -> fixedBits, "lsh_scaled" -> scaledBits)) {
      time(s"$label bits=$bits") {
        Similarity.annLshKnn(e, k = 3, bits = bits)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
