package graft.tools

import graft.{GraftSession, Prewarm, Tables}

/** One-shot prewarm wall-clock measurement — the A/B harness behind
  * the scheduler-attribution note in BASELINE.md (round-12 advisor
  * item: FAIR mode without per-job pools is single-pool FIFO, so the
  * round-11 31→12 s claim needed re-attribution). Dev tool only.
  *
  * Usage: `sbt "runMain graft.tools.PrewarmBench"` with
  * `SPARK_GRAFT_CONF="spark.scheduler.mode=FIFO"` (or FAIR) for the
  * A/B; Prewarm always names a distinct pool per task, which FIFO
  * root scheduling ignores.
  */
object PrewarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    Tables.enableInputCache()
    val mode = spark.conf.get("spark.scheduler.mode")
    val t0 = System.nanoTime()
    val tasks = Prewarm.run(spark, sfDir)
    val wall = (System.nanoTime() - t0) / 1e9
    val failed = tasks.count(!_.ok)
    println(f"""{"metric":"prewarm","mode":"$mode","wall_sec":$wall%.1f,"n_tasks":${tasks.size},"n_failed":$failed,"slowest":${tasks.sortBy(-_.sec).take(5).map(t => f""""${t.name}":${t.sec}%.1f""").mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
