package graft

/** Plan-audit main: prints `explain("formatted")` for representative
  * queries so plan regressions (lost pushdown, surprise sort, missing
  * broadcast, codegen fallback) are visible in one run.
  *
  *   sbt "runMain graft.Explain [sfDir] [query ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val picks = if (args.length > 1) args.tail.toSet else Set(
      "star_join", "semi_join", "q1_agg", "latest_bucket", "top_movers",
      "top100_domain", "knn_bruteforce", "embed_neardup", "dedup_exact",
      "minhash_pairs")
    val spark = GraftSession.local()
    SparkEntry.queries.filter(kv => picks(kv._1)).foreach { case (name, fn) =>
      println(s"\n======== $name ========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"[explain] $name failed: $e") }
    }
    spark.stop()
  }
}
