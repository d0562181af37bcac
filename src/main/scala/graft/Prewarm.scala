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
  * dependency. Requires FAIR job scheduling (GraftSession) — under
  * FIFO the iterative small-job builds (k-means, CC) queue behind
  * the pair-join stages and the overlap evaporates (measured 31 s
  * prewarm wall vs 12 s under FAIR).
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

  /** Gated queries whose BUILDER executes jobs (store mutations, the
    * corpus_prepare tallies, the CC contraction loop) rather than
    * just declaring a plan — running them here would duplicate real
    * work, not precompile it.
    */
  private val noPrecompile = Set(
    "corpus_prepare", "top100_refresh", "holders_upsert",
    "tx_insert_ignore", "cursor_store", "job_audit",
    "dedup_components", "dedup_components_dist",
    "media_knn") // eager localCheckpoint of the decode pipeline at build

  /** Run all prewarm tasks for (spark, dir); returns per-task seconds
    * (wall, as observed by each task's thread).
    */
  def run(spark: SparkSession, dir: String,
          threads: Int = 8): Seq[(String, Double)] = {
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
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
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
          val t0 = System.nanoTime()
          try thunk()
          catch { case e: Throwable =>
            System.err.println(s"[prewarm] $name failed: ${e.getMessage}")
          }
          out.add(name -> (System.nanoTime() - t0) / 1e9)
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
    out.removeIf(_._1.startsWith("__cg_"))
    out.add(s"codegen_precompile(${compiled.get})" -> cgWall)
    out.asScala.toSeq
  }
}
