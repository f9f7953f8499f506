package graft

import org.apache.spark.sql.SparkSession

/** Session factory for tests / CLI entry points.
  *
  * The driver (Verify/Bench) builds its own session; library code must
  * therefore never depend on builder-time conf. Anything semantic
  * (ANSI-safe casts, null ordering) is handled per-expression in the
  * operators instead (see [[graft.operators]]).
  */
object SparkEngine {
  /** Broadcast-join threshold derated for small heaps.
    *
    * Spark's 10 MB `spark.sql.autoBroadcastJoinThreshold` is static: the
    * planner compares it against the build side's ESTIMATED (compressed,
    * columnar) size, but BroadcastExchangeExec then materializes the
    * deserialized rows PLUS a LongToUnsafeRowMap/BytesToBytesMap on the
    * driver — routinely 10–30× the estimate — and guards the build with
    * "Not enough memory to build and broadcast the table". On a 2 GiB
    * heap the sf1 memory sweep (BENCH_MEM.md) hit exactly that guard on
    * two dedup queries whose build sides pass the 10 MB estimate. A
    * threshold the heap cannot actually honor is a misconfiguration, so
    * sessions derate it linearly below ~5 GiB: heap/512 (2 GiB → 4 MiB),
    * which flips the marginal builds to sort-merge — slower, bounded,
    * completes. At production heaps (≥ 5 GiB) this returns Spark's stock
    * 10 MB and plans are bit-identical to an unconfigured session.
    */
  def broadcastThreshold(
      maxHeapBytes: Long = Runtime.getRuntime.maxMemory()): Long =
    math.min(10L << 20, maxHeapBytes / 512)

  /** Shuffle/checkpoint scratch directory (round 11, guide §1.3/§2.1):
    * on this sandbox the filesystem behind the default `spark.local.dir`
    * charges every shuffle-file create/write ~50–160 ms of SYSTEM CPU
    * per task — measured: a 5 000-row `orderBy` over 32 partitions cost
    * ~3 CPU-s, and pointing local.dir at tmpfs cut shuffle-stage CPU
    * 65–80 % (q_window_funcs 7.05 → 2.44 s, q_topk_per_group 5.89 →
    * 1.22 s executor CPU at identical plans). Shuffle files are
    * transient by construction (ContextCleaner + the 2-min periodic GC
    * bound the live set; the full-catalog gate writes ~1 GB per pass
    * against a 126 GB tmpfs), so RAM-backed scratch is the right local
    * medium — the same call a production deployment makes by putting
    * local.dir on NVMe instead of network/overlay storage.
    *
    * Parameterised for scale: `SPARK_GRAFT_LOCAL_DIR=<path>` overrides
    * (big-decade corpora MUST point this at real disk — a ×1000 graph
    * run keeps ~58 GB of scratch live, which does not belong in RAM
    * next to the corpus page cache); unset picks tmpfs when writable,
    * else leaves Spark's default.
    */
  def localDir(): Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").map(_.trim).filter(_.nonEmpty)
      .orElse {
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) Some("/dev/shm/spark-graft")
        else None
      }

  /** `b` with [[localDir]] applied (no-op when None). */
  def applyLocalDir(b: SparkSession.Builder): SparkSession.Builder =
    localDir().fold(b)(d => b.config("spark.local.dir", d))

  /** Generic conf pass-through (`SPARK_GRAFT_CONF="k=v;k=v"`) for the
    * Verify/Bench mains, so forced-path gate runs (e.g. the
    * quantile-sketch checkpoint bypass) go through the same entry
    * points as every other number. Apply LAST, after every hardcoded
    * `.config`, so an override of a pinned key (rdd.compress, AQE,
    * the ObjectHashAggregate fallback ceiling, …) actually wins —
    * Verify used to fold it in first and silently lose those
    * overrides (round-10 advice). A malformed entry (no '=') fails
    * loudly naming the token instead of a bare MatchError.
    */
  def applyConfPassThrough(b: SparkSession.Builder,
      raw: Option[String] = sys.env.get("SPARK_GRAFT_CONF")): SparkSession.Builder =
    raw.toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.nonEmpty)
      .foldLeft(b) { (bb, kv) =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty => bb.config(k.trim, v)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_CONF entry '$kv' is not k=v")
        }
      }

  /** Pinned conf mirrors SURVEY.md §7 phase A: UTC, no UI, shuffle
    * partitions sized for local cores rather than the 200 default.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = applyLocalDir(SparkSession.builder()
      .master(master)
      .appName("graft"))
      // Full extension stack by default: FastHashRule (md5 → Md5Fast,
      // the per-row JCA-lookup fix) and AsofStrategy (native as-of
      // planning). Library queries also work without them — the rule is
      // an optimization, the strategy only plans AsofJoinNode — but a
      // production session should have both.
      .withExtensions(new graft.plans.GraftExtensions().apply)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // Heap-aware broadcast ceiling — see broadcastThreshold above.
      .config("spark.sql.autoBroadcastJoinThreshold",
        broadcastThreshold().toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ICU case mapping routes upper/lower through
      // CollationAwareUTF8String, whose static init title-cases every
      // Unicode code point; when the JIT is busy with codegen output it
      // runs interpreted for minutes (observed 490s on a 200-row query).
      // JVM case mapping is identical for ASCII corpora and never stalls.
      .config("spark.sql.icu.caseMappings.enabled", "false")
      // Compress SERIALIZED storage blocks (DISK_ONLY / *_SER levels —
      // deserialized in-memory blocks are untouched). The graph queries
      // checkpoint DATA-sized edge frames at DISK_ONLY (see q_pagerank);
      // measured at the ×100 corpus (GraphCkptSizeProbe, round 10): the
      // edge checkpoint shrinks 12.0 GB → 1.63 GB (7.4×) and the query
      // runs 29% FASTER (322.8 → 230.0 s) because four edge-frame reads
      // of 1.6 GB beat four of 12 GB — LZ4 on long-triple rows is
      // cheaper than the disk IO it saves. Storage-only: values and
      // plans are unchanged (full catalog re-oracled after the flip).
      .config("spark.rdd.compress", "true")
      // Broadcast children are built on a driver thread with a 300 s
      // default deadline — tuned for "small dim table", not "small
      // RESULT of a big computation". Queries broadcast 1-row aggregates
      // whose subplans scan real data (q_modularity's edge count hit the
      // 300 s wall at the ×1000 corpus); the queries now keep such
      // children cheap by construction, and this headroom keeps the next
      // decade's marginal case a slow plan instead of a dead one.
      .config("spark.sql.broadcastTimeout", "1800")
      // ContextCleaner frees shuffle files only after the driver GC
      // collects their handles; its fallback periodic GC defaults to
      // 30 MINUTES — longer than most queries, so a 24 GiB driver heap
      // under no allocation pressure lets every finished stage's
      // shuffle files pile up on disk for the query's whole lifetime
      // (measured round 10: q_pagerank ×1000 accumulated its dedup
      // exchange + three 20 GB iteration shuffles and exhausted a
      // 58 GB scratch disk). 2 minutes bounds the garbage window;
      // paired with per-iteration lineage truncation at the call sites
      // (q_pagerank), peak scratch is one live iteration, not the sum.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // TIMESTAMP(NANOS) parquet columns (the `events` table) surface as
      // raw long instead of erroring. Pinned at build time so the flag
      // never flips mid-session; Tables.events keeps a lazy set as a
      // fallback for externally-built sessions (driver Verify/Bench).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Production state store for streaming state (sessionizeTws,
      // heavy hitters, stream-stream joins): RocksDB keeps state off
      // the JVM heap and bounded by compaction; changelog checkpointing
      // makes the per-batch commit an append instead of a full SST
      // upload. Measured (BENCH_STREAM.md ×10): 15k-session state at
      // 1.4–2.2 MB checkpoints, exactly-once across restart.
      // Checkpoint-replica durability on multi-executor clusters (see
      // graft.Ckpt): replication targets come from a peer list cached
      // 60s, so blocks written just after an executor death replicate
      // into the corpse — the default ONE replication attempt then gives
      // up before the on-failure peer refresh is consulted, leaving the
      // block silently single-copy (measured: ExecutorLossProbe,
      // "replicated to only 0 peer(s)" in executor logs). A failure
      // budget of 5 lets the refreshed list win; proactive re-replication
      // restores lost replicas after every executor removal. Both no-ops
      // in single-executor (local) sessions.
      .config("spark.storage.maxReplicationFailures", "5")
      .config("spark.storage.replication.proactive", "true")
      // The failure budget can't help when the CACHED peer list is
      // EMPTY (fetched in the gap between a death and its replacement's
      // registration): zero peers → zero attempts → zero failures → no
      // forced refresh, and every replicated write for the next TTL is
      // silently single-copy ("Expecting 1 replicas with only 0
      // peer/s", measured). Default TTL is 60s; 5s bounds the
      // post-churn blind window at one RPC per writing executor per 5s.
      .config("spark.storage.cachedPeersTtl", "5000")
      // TypedImperativeAggregate partials (graft_topk, graft_kmv,
      // graft_heavy_hitters) run in ObjectHashAggregateExec, which falls
      // back to SORT-BASED aggregation after `fallbackThreshold` DISTINCT
      // KEYS per partition — default 128. Any per-group top-k over a
      // real key domain blows past 128 keys, and the fallback then sorts
      // the ENTIRE input stream per partition: at the ×1000 corpus that
      // silently re-introduced the exact candidate-stream sort
      // BoundedTopK exists to avoid (q_embed_ivf: 239 GB spill, the
      // N×nCells assignment stream × ~85 B/row — measured round 9; with
      // this ceiling the same query spills ~0). 65536 bounds the partial
      // map at keys × bufferSize per task: ~33 MB for top-k's ≤16k+ε-byte
      // heaps — safe at any heap this engine targets. Callers grouping a
      // WIDE sketch (graft_kmv: ~33 KB/buffer) by a high-cardinality key
      // should lower it; every catalog KMV/MG site groups by ≤10 keys.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      // Catalog-table sinks (Sinks.writeBucketed) land under a stable
      // scratch root instead of ./spark-warehouse in whatever cwd the
      // JVM happened to start in. Deployments override per cluster.
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
