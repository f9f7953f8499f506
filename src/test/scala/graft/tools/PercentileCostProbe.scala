package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cost check for the round-8 percentile rewrites (not a test): the ×10
  * oracle sweep forced q_winsorize / q_skew_report off the
  * `percentile()` builtin (tied-bracket lerp short-circuit ≠ DuckDB's
  * two-product QUANTILE_CONT) and onto histogram-ranks + explicit
  * interpolation — which tripled their LOCAL wall (~0.5 → ~1.5 s at
  * sf0.1). This probe measures whether that trade inverts at scale, as
  * the rewrite's design predicts: the builtin is an
  * ObjectHashAggregate that buffers EVERY value of a group in one
  * task's sketch, while the histogram shape is a codegen partial+final
  * count over (group, value) followed by rank arithmetic on the tiny
  * distinct-value frame.
  *
  * Each variant runs the FULL query (bounds + clamp/report + sort, the
  * user-visible cost), materialized with the same noop write
  * `graft.Bench` uses; `passes` runs, min reported.
  *
  * Run: `sbt "Test/runMain graft.tools.PercentileCostProbe <sfDir> [passes]"`
  * Results: BENCH_SCALE.md round-9 section + ledger.
  */
object PercentileCostProbe {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables(s, dir, name)

  /** q_winsorize with bounds from the percentile() builtin — the
    * pre-round-8 shape (oracle-divergent on tied brackets; used here
    * only to measure the builtin's buffering cost).
    */
  private def winsorizeBuiltin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
    val qs = ev.groupBy(col("event_type").as("et"))
      .agg(percentile(col("value"), lit(0.05)).as("lo"),
        percentile(col("value"), lit(0.95)).as("hi"))
    ev.join(broadcast(qs), col("event_type") === col("et"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo")), col("hi")).as("w_value"))
      .orderBy(col("event_id"))
  }

  /** q_skew_report with p50/p99 from the percentile() builtin over the
    * keyed-count frame (pre-round-8 shape).
    */
  private def skewReportBuiltin(s: SparkSession, dir: String): DataFrame = {
    def prof(df: DataFrame, c: String) = {
      val keyed = df.groupBy(col(c)).agg(count(lit(1)).cast("long").as("n"))
      keyed.agg(
          count(lit(1)).cast("long").as("n_keys"),
          sum(col("n")).cast("long").as("n_rows"),
          max(col("n")).cast("long").as("max_key_rows"),
          percentile(col("n"), lit(0.5)).as("p50_key_rows"),
          percentile(col("n"), lit(0.99)).as("p99_key_rows"))
        .select(lit(c).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_key_rows"), col("p50_key_rows"), col("p99_key_rows"),
          (col("max_key_rows") / col("n_rows")).as("top1_share"),
          (col("max_key_rows") / col("p50_key_rows")).as("skew_ratio"))
    }
    prof(t(s, dir, "orders"), "o_custkey")
      .union(prof(t(s, dir, "lineitem"), "l_suppkey"))
      .orderBy(col("key_col"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaledata/sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32").toInt
    val spark = graft.SparkEngine.session("local[32]", shufflePartitions = parts)
    spark.sparkContext.setLogLevel("WARN")

    def bench(tag: String)(f: => DataFrame): Double = {
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[pctl-probe] $tag%-28s min=$best%.2fs all=${times.map(x => f"$x%.2f").mkString(",")}")
      best
    }

    val variants = Seq(
      ("winsorize/histogram-ranks",
        () => graft.SparkEntry.queries("q_winsorize")(spark, dir)),
      ("winsorize/builtin",
        () => winsorizeBuiltin(spark, dir)),
      ("skew_report/histogram-ranks",
        () => graft.SparkEntry.queries("q_skew_report")(spark, dir)),
      ("skew_report/builtin",
        () => skewReportBuiltin(spark, dir)))
    val results = variants.map { case (tag, mk) => tag -> bench(tag)(mk()) }
    println("[pctl-probe] dir=" + dir + " parts=" + parts + " " +
      results.map { case (t, v) => f"$t=$v%.2f" }.mkString(" "))
    spark.stop()
  }
}
