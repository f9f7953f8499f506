package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Executor-aware `localCheckpoint` policy.
  *
  * `localCheckpoint` TRUNCATES lineage: its blocks become the only copy
  * of the frame, and Spark's default level stores each block on exactly
  * one executor. On a multi-executor cluster a single executor loss —
  * the fault a 1000-executor run takes daily — then kills every query
  * holding such a checkpoint with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
  * (measured: `graft.tools.ExecutorLossProbe`, BENCH_INVARIANCE.md;
  * the same probe shows a ×2-replicated level surviving the identical
  * kill with an unchanged result fingerprint).
  *
  * Policy: when the session has two or more executors, checkpoint at
  * the requested base level with replication 2 — every block has a
  * replica on another executor, so any SINGLE loss leaves a live copy
  * and the query keeps running (a second concurrent loss can still hit
  * both replicas; that is the same residual risk HDFS replication
  * accepts). Single-executor sessions (local[...], the oracle gate,
  * every spec) have nowhere to replicate to and keep the base level
  * bit-for-bit — plans and results are unchanged there. Override with
  * `spark.graft.checkpointReplicas` (int; `auto` = the above).
  *
  * All operator/query `localCheckpoint` sites route through here; the
  * replication is storage-only and never changes values, which the
  * executor-loss probe's fingerprint equality pins.
  */
object Ckpt {
  /** Live executors as the scheduler sees them (the driver counts as
    * one entry, so > 2 means >= 2 real executors).
    */
  private def multiExecutor(spark: SparkSession): Boolean =
    spark.sparkContext.statusTracker.getExecutorInfos.length > 2

  private def replicas(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.checkpointReplicas") match {
      case Some(n) if n != "auto" => n.toInt
      case _ => if (multiExecutor(spark)) 2 else 1
    }

  /** `base` with the session's replication policy applied. */
  def level(spark: SparkSession,
      base: StorageLevel = StorageLevel.MEMORY_AND_DISK): StorageLevel = {
    val r = replicas(spark)
    if (r == base.replication) base
    else StorageLevel(base.useDisk, base.useMemory, base.useOffHeap,
      base.deserialized, r)
  }

  /** Drop-in for `df.localCheckpoint()` (eager), replication-aware. */
  def local(df: DataFrame,
      base: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    df.localCheckpoint(true, level(df.sparkSession, base))

  /** `import graft.Ckpt.CkptOps` and write `.ckpt()` where
    * `.localCheckpoint()` used to sit — same chain position, policy
    * applied.
    */
  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(base: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
      local(df, base)
  }
}
