package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev-only per-query stage ledger (round-18 optimization pass): runs
  * named declared queries exactly the way the bench does (noop sink),
  * once warm + once timed, and prints the per-STAGE wall/cpu/spill
  * breakdown of the timed pass so optimization work targets the
  * measured dominant stage, not a guess. Not part of the driver
  * contract.
  *
  *   sbt "runMain graft.tools.QueryStages <sfDir> <query> [query ...]"
  */
object QueryStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: QueryStages <sfDir> <query> [query ...]")
    val unknown = names.toSet -- graft.SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val spark = graft.GraftSession.local()
    if (!sys.env.contains("SPARK_GRAFT_NO_INPUT_CACHE"))
      graft.Tables.enableInputCache()

    final case class Rec(id: Int, name: String, tasks: Int, wallMs: Long,
                         cpuMs: Long, spillMB: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[Rec]()
    val cpu = new java.util.concurrent.ConcurrentHashMap[Int, (java.util.concurrent.atomic.AtomicLong, java.util.concurrent.atomic.AtomicLong)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          val e = cpu.computeIfAbsent(te.stageId, _ =>
            (new java.util.concurrent.atomic.AtomicLong(0),
              new java.util.concurrent.atomic.AtomicLong(0)))
          e._1.addAndGet(m.executorRunTime)
          e._2.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val e = cpu.getOrDefault(si.stageId,
          (new java.util.concurrent.atomic.AtomicLong(0),
            new java.util.concurrent.atomic.AtomicLong(0)))
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(0L)
        // attribute to the first graft frame in the callsite stack —
        // the short name is usually an anonymous future frame
        val where = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("QueryStages"))
          .map(_.trim.stripPrefix("at ").take(90))
          .getOrElse(si.name.takeWhile(_ != '\n').take(90))
        stages.add(Rec(si.stageId, where, si.numTasks, wall,
          e._1.get, e._2.get / (1024 * 1024)))
      }
    })

    import scala.jdk.CollectionConverters._
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm pass: shared-memo builds + codegen land here, like the
      // bench cold pass
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graftbridge.CodegenPrewarm.drainListeners(spark.sparkContext)
      stages.clear(); cpu.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.CodegenPrewarm.drainListeners(spark.sparkContext)
      val recs = stages.asScala.toSeq
      println(f"==== $name steady ${wall}%.3f s  (${recs.size} stages, " +
        f"${recs.map(_.tasks).sum} tasks, stage-wall ${recs.map(_.wallMs).sum / 1000.0}%.2f s, " +
        f"cpu ${recs.map(_.cpuMs).sum / 1000.0}%.2f s)")
      recs.sortBy(-_.wallMs).take(14).foreach { r =>
        println(f"  #${r.id}%-5d ${r.tasks}%4d tasks  wall ${r.wallMs / 1000.0}%7.2f s  " +
          f"cpu ${r.cpuMs / 1000.0}%7.2f s  spill ${r.spillMB}%5d MB  ${r.name}")
      }
    }
    spark.stop()
  }
}
