package graft.tools

/** Dev probe: raw Spark job-scheduling overhead on this machine —
  * repeated trivial jobs (a 32-partition range count and a one-task
  * count), timed per batch. Separates "the engine's plans got slower"
  * from "every job's fixed overhead got slower" when bench walls
  * drift: plan regressions show up per-query, environment/scheduler
  * drift shows up here too.
  */
object JobOverhead {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).count() // warm
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 20) { spark.range(1000000).count(); i += 1 }
      println(f"[overhead] 20 range-count jobs: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { spark.sparkContext.parallelize(Seq(1), 1).count(); i += 1 }
      println(f"[overhead] 50 one-task jobs: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
