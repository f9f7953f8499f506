package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Scale-knob probe (round 7): times the ANN operators at settings that
  * TRACK corpus size, versus the catalog queries' fixed oracle settings.
  *
  * The catalog pins `q_embed_ivf` at nCells=16 and `q_embed_ann_lsh` at
  * bits=8 because the DuckDB oracle replays those parameters bit-for-bit
  * — correct for the hash check, but at 30× corpus a FIXED cell/bucket
  * count means per-cell population grows linearly and the within-cell
  * pair space quadratically. That is not an operator defect: the
  * operator takes the knob, and the production rule is
  * cells ∝ N (constant expected cell population) / bits ≈ log2(N /
  * target-bucket-size). This main measures both settings side by side on
  * the same data so BENCH_SCALE.md can adjudicate the ⚠ rows with
  * numbers instead of argument.
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
