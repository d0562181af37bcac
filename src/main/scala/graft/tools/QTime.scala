package graft.tools

import graft._

/** Dev tool: warm-run wall time + join/exchange plan lines for named
  * SparkEntry queries (`runMain graft.tools.QTime q1 q2 …`). Quick
  * single-query probe; the driver protocol numbers come from
  * [[graft.Bench]].
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val f = SparkEntry.queries(name)
      f(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      f(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[qtime] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      println(f(spark, dir).queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Cartesian"))
        .map(_.trim.take(110)).mkString("\n"))
    }
    spark.stop()
  }
}
