package graft

import java.util.concurrent.{Executors, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Concurrent build of the session-scoped shared artifacts — the M7
  * frames (input columnar caches, tokenized docs, the θ=0.5 pair
  * graph, activity flows) and the per-corpus trained models (BPE
  * merges, k-means quantizer, bigram LM, the SemDeDup decision) —
  * plus ahead-of-time Janino compilation of the query inventory's
  * codegen stages, before any query runs.
  *
  * Rationale (round-11 cold-pass work): a serial first pass over the
  * suite pays every one of these builds inside whichever query
  * alphabetically touches it first, on 1 of 32 cores' worth of
  * scheduling — and pays one Janino compile per codegen shape on the
  * driver thread, serially, per query. A long-lived service does
  * what this does instead: overlap the independent builds and the
  * plan compilation on idle cores at startup. The work is identical
  * either way — [[graft.Bench]] counts the prewarm wall-clock INTO
  * `cold_total` (reported separately as `prewarm_sec`), so the bench
  * cold number stays an honest "process start → suite done once"
  * measurement; it just stops serializing work with no serial
  * dependency. Fair slot sharing needs BOTH
  * `spark.scheduler.mode=FAIR` (GraftSession) AND a distinct
  * `spark.scheduler.pool` per task (set below): FAIR mode alone
  * leaves every job in the single on-demand 'default' pool, whose
  * internal ordering is FIFO — fair sharing only applies across
  * pools (measured 31 s prewarm wall under FIFO vs 12-17 s with
  * concurrent submission; see BASELINE.md for the r12 re-measure
  * attributing the split between slot backfill and pool fairness).
  *
  * Thread-safety: the underlying memos are `computeIfAbsent`-backed
  * ([[SessionCache]]), so a build raced by a query (or another
  * prewarm task) is computed once and every other caller blocks on
  * the winner. Phase 0 (input caches + tokenized docs) runs before
  * the dependent phase-1 builds so no build is computed twice under
  * two memo keys; phase 2 (codegen precompile) runs last so building
  * a query's plan finds every memo warm and triggers no jobs.
  */
object Prewarm {

  /** One prewarm task's outcome: wall seconds as observed by its
    * thread, and whether the build completed without throwing. A
    * failed build is NOT fatal to the bench (the owning query's cold
    * pass will rebuild and surface the real error) but it must be
    * visible — PrewarmSpec asserts zero failures so a broken build
    * surfaces in CI, not inside an unattended driver round.
    */
  final case class Task(name: String, sec: Double, ok: Boolean)

  /** Gated queries whose BUILDER executes jobs (store mutations, the
    * corpus_prepare tallies, the CC contraction loop) rather than
    * just declaring a plan — running them here would duplicate real
    * work, not precompile it.
    */
  private val noPrecompile = Set(
    "corpus_prepare", "top100_refresh", "holders_upsert",
    "tx_insert_ignore", "cursor_store", "job_audit",
    "dedup_components", "dedup_components_dist",
    "media_knn", "media_knn_ivf", // eager localCheckpoint of the decode pipeline at build
    "media_knn_ivf_auto") // + eager auto-quantizer training at build

  /** Run all prewarm tasks for (spark, dir); returns per-task
    * [[Task]] outcomes.
    */
  def run(spark: SparkSession, dir: String,
          threads: Int = 8): Seq[Task] = {
    val (toksPhase, textRest) = queries.TextPipeline.prewarmTasks(spark, dir)
    // the parquet WRITE path (committer classes, ParquetOutputWriter,
    // compression codec init) is its own one-time cost, otherwise
    // paid inside the first store-mutation query's cold number
    val writeWarm = "write_path" -> (() => {
      val p = java.nio.file.Files.createTempDirectory("graft_prewarm")
      try spark.range(2).selectExpr("id", "id % 2 as part")
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("part").parquet(p.resolve("t.parquet").toString)
      finally org.apache.commons.io.FileUtils.deleteQuietly(p.toFile)
      ()
    })
    val phase0 = Tables.prewarmTasks(spark, dir) ++ toksPhase ++
      queries.Relational.prewarmTasks(spark, dir) :+ writeWarm
    val phase1 = textRest
    val out = new java.util.concurrent.ConcurrentLinkedQueue[Task]()
    // one tiny job first: the very first Spark job in a JVM pays
    // lazy engine init (block manager, shuffle system, codec load) —
    // absorb it here rather than inside phase-0 task attribution
    spark.range(1).count()
    def runPhase(tasks: Seq[(String, () => Unit)]): Unit = {
      if (tasks.isEmpty) return
      val pool = Executors.newFixedThreadPool(math.min(threads, tasks.size))
      tasks.foreach { case (name, thunk) =>
        pool.execute(() => {
          // worker threads need the active session for SQLConf.get
          // (plan building, codegen rules)
          SparkSession.setActiveSession(spark)
          // DISTINCT scheduler pool per task: with only
          // spark.scheduler.mode=FAIR, jobs submitted into the single
          // on-demand 'default' pool still order FIFO (fair sharing
          // applies ACROSS pools, and the pool's own internal mode
          // defaults to FIFO). Naming a fresh pool per task puts each
          // concurrent build in its own child pool of the FAIR root,
          // so the iterative many-small-job builds (k-means, CC)
          // actually share slots with the long pair-join stages
          // instead of queueing behind them.
          spark.sparkContext.setLocalProperty("spark.scheduler.pool",
            s"prewarm_$name")
          val t0 = System.nanoTime()
          val ok =
            try { thunk(); true }
            catch { case e: Throwable =>
              System.err.println(s"[prewarm] $name failed: ${e.getMessage}")
              false
            }
            finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
          out.add(Task(name, (System.nanoTime() - t0) / 1e9, ok))
        })
      }
      pool.shutdown()
      pool.awaitTermination(30, TimeUnit.MINUTES)
    }
    runPhase(phase0)
    runPhase(phase1)
    // phase 2: ahead-of-time codegen compile of the query inventory
    // (same sources execution would compile — see CodegenPrewarm);
    // recorded as ONE entry so the log stays readable
    val t2 = System.nanoTime()
    val compiled = new java.util.concurrent.atomic.AtomicInteger(0)
    runPhase(SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => noPrecompile(n) }
      .map { case (name, fn) =>
        s"__cg_$name" -> (() => {
          compiled.addAndGet(org.apache.spark.sql.graftbridge.CodegenPrewarm
            .precompile(fn(spark, dir)))
          ()
        })
      })
    import scala.jdk.CollectionConverters._
    val cgWall = (System.nanoTime() - t2) / 1e9
    val cgOk = out.asScala.filter(_.name.startsWith("__cg_")).forall(_.ok)
    out.removeIf(_.name.startsWith("__cg_"))
    out.add(Task(s"codegen_precompile(${compiled.get})", cgWall, cgOk))
    out.asScala.toSeq
  }
}
