package graft

import org.apache.spark.sql.SparkSession

/** One place that knows how to build a correctly-configured session
  * for this engine (Bench, Verify, tests, CLI). Config set here, not
  * mutated mid-query:
  *
  *  - `spark.sql.shuffle.partitions` sized to the core count — at
  *    local[32] with sub-GB inputs, 200 partitions is pure scheduling
  *    overhead; on a real cluster this would be set to ~2-3× total
  *    cores by the launcher.
  *  - UTC session timezone (reference stores/format everything UTC).
  *  - `parquet.nanosAsLong`: the driver's events fixture carries
  *    INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  *    unless read as raw longs (converted back in [[Tables.table]]).
  *  - AQE is on by default in Spark 4 (adaptive shuffle coalescing +
  *    skew-join splitting) — left enabled deliberately.
  */
object GraftSession {

  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // AQE's coalescing floor is 1 MB per partition — right for
      // byte-bound scans, wrong for CPU-dense small shuffles (text
      // tokenization, signature aggregates, pair joins over hashed
      // keys), where it was measured collapsing 32-way stages onto 1-2
      // cores. 64 KB lets `parallelismFirst` (default on) actually
      // reach default parallelism; at PB scale partitions are far
      // above either floor, so this only affects the small-shuffle
      // regime it is meant to fix.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // Let AQE convert sort-merge joins to shuffled hash joins when
      // every map partition is small (runtime-measured): the hashed
      // pair-generation joins (shingle blocking, LSH buckets) pay an
      // unnecessary double sort under SMJ. Genuinely large joins
      // exceed the threshold and keep the SMJ spill path — the
      // conversion is size-gated per partition, so it is safe at any
      // scale.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      // The store's write paths are many small parquet jobs (cursor /
      // audit rewrites); _SUCCESS markers are driver-side fs round
      // trips nothing reads. Commit protocol stays v1 (job-commit
      // rename) — v2's task-commit visibility would let a failed
      // append leave partial files, which the store's idempotent-key
      // design does not tolerate.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // The generated-class cache defaults to 100 entries; a workload
      // with ~50 query shapes × several codegen stages each overflows
      // it, so steady-state execution silently RE-RUNS Janino
      // compilation for evicted shapes on every query. Measured on the
      // full bench: 32.4 s → 22.5 s steady total from this one line. A
      // long-lived service with a wide query inventory wants the same.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // FAIR root scheduling. On its own this does NOT reorder
      // anything: with no allocation file every job lands in the one
      // on-demand 'default' pool, whose internal mode is FIFO, and
      // fair sharing only applies ACROSS pools. It becomes effective
      // when a submitter names a pool per concurrent workload via the
      // spark.scheduler.pool local property — [[Prewarm]] does (one
      // pool per startup build), and a multi-tenant service would
      // (one pool per tenant). Serial workloads schedule identically
      // either way, so the conf is free; the concurrent-build win it
      // enables is measured in BASELINE.md (r12 prewarm A/B).
      .config("spark.scheduler.mode", "FAIR")
      // Id-free generated class names: the codegen stage id in the
      // class name is debugging sugar that makes otherwise-identical
      // sources unequal, defeating the source-keyed generated-class
      // cache across queries sharing a subtree shape (and defeating
      // [[Prewarm]]'s ahead-of-time compile, whose stage ids cannot
      // match AQE's per-stage numbering).
      .config("spark.sql.codegen.useIdInClassName", "false")

  /** Long-running streaming preset: RocksDB state store, so unbounded
    * keyed state (streamingTop100's holder maps, stream-stream join
    * buffers) lives off-heap/on-disk instead of executor heap, with
    * changelog checkpointing to keep commits incremental. Batch jobs
    * don't need it; streaming jobs at scale should not run without it.
    */
  def streamingBuilder(cpus: String): SparkSession.Builder =
    builder(cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")

  /** Session for driver-run mains: core count from SPARK_GRAFT_CPUS.
    * SPARK_GRAFT_CONF ("k=v;k=v") applies ad-hoc overrides last — a
    * dev hook for config A/B runs (e.g. measuring AQE barrier cost),
    * not a production surface.
    */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = sys.env.get("SPARK_GRAFT_CONF").map(_.split(";").toSeq).getOrElse(Nil)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k.trim, v.trim) }
      .foldLeft(builder(cpus)) { case (bb, (k, v)) => bb.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
