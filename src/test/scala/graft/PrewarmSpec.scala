package graft

import org.apache.spark.sql.functions._

/** Insurance for the unattended driver bench: [[Prewarm.run]] must
  * complete without throwing and leave the session memos warm —
  * a prewarm failure mode discovered only inside the driver's
  * per-round Bench run would cost a whole round's numbers.
  */
class PrewarmSpec extends SparkSpec {

  test("Prewarm.run completes, reports every task, and warms the memos") {
    val dir = "/root/testdata/sf0.001"
    // ISOLATED session + flag restore: the input-cache flag is
    // process-global and the base session is shared JVM-wide — leaking
    // either would make later suites' plan assertions (raw parquet
    // scans, pushed filters) order-dependent. A new session gets its
    // own Tables/SessionCache memo namespace, so nothing this test
    // resolves or persists is visible to other suites.
    val isolated = spark.newSession()
    val wasEnabled = Tables.inputCacheEnabled
    Tables.enableInputCache()
    val (tasks, wall) =
      try {
        val t0 = System.nanoTime()
        val ts = Prewarm.run(isolated, dir, threads = 4)
        (ts, (System.nanoTime() - t0) / 1e9)
      } finally if (!wasEnabled) Tables.disableInputCache()
    val names = tasks.map(_.name)
    // every declared build surfaced a timing (none vanished into a
    // swallowed executor death)
    for (expected <- Seq("tokenized_docs", "ngram_pairs", "self_perplexity",
        "bpe_merges", "ivf_centroids", "semantic_dedup", "activity_flows",
        "write_path", "cache_lineitem"))
      assert(names.contains(expected), s"missing prewarm task: $expected")
    assert(names.exists(_.startsWith("codegen_precompile(")),
      s"missing codegen precompile entry in $names")
    // ... and every build actually SUCCEEDED — a swallowed failure
    // with a recorded timing must trip CI, not cost a driver round
    val failed = tasks.filterNot(_.ok).map(_.name)
    assert(failed.isEmpty, s"prewarm tasks failed: ${failed.mkString(", ")}")
    // warmed memos serve queries immediately (no recompute errors) —
    // one query per family that rides a prewarmed artifact
    for (q <- Seq("ngram_jaccard", "lm_perplexity", "semantic_dedup",
        "activity_flows", "knn_ivf"))
      assert(SparkEntry.queries(q)(isolated, dir).limit(1).count() >= 0, q)
    assert(wall < 600, s"prewarm took $wall s at sf0.001 — hang regression")
  }
}
