package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Per-stage wall attribution for the LAZY composed prepare chain at
  * ×R (round 18, VERDICT item 6): the accounted variant attributes
  * cost through its per-stage counting actions, but the lazy variant
  * (withStats = false, the production path) runs as ONE job chain
  * with zero accounting actions — its ×R wall was only a single
  * number, leaving two open questions: (a) where does the lazy wall
  * actually go, and (b) does any shared frame recompute without the
  * eager checkpoints the accounting actions force?
  *
  * This probe answers both WITHOUT adding actions: a SparkListener
  * records every completed stage's wall, task count, and call site
  * while the lazy pipeline runs, then
  *  - prints per-stage rows (top of the wall distribution, keyed by
  *    the stage's call site — the operator that planned it), and
  *  - groups stages by (callSite, task count, input bytes) signature
  *    and reports groups appearing more than once: a shared frame
  *    recomputing shows up as a repeated signature with nonzero
  *    input, while legitimate repeats (the CC contraction loop's
  *    per-iteration stages) are visibly the iterative operator.
  *
  * Usage: `runMain graft.tools.LazyAttribution [fixtureDir]` (default
  * `target/sf1`). Dev tool — results recorded in BASELINE.md.
  */
object LazyAttribution {
  private final case class St(id: Int, name: String, wallMs: Long,
                              tasks: Int, inputMB: Long, shuffleReadMB: Long,
                              shuffleWriteMB: Long)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    // A/B hook for the round-18 eager-staging knob
    sys.env.get("SPARK_GRAFT_EAGER_STAGE").foreach(v =>
      spark.conf.set(graft.pipelines.Corpus.EagerStageKey, v))
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val wall = (for (c <- si.completionTime; s <- si.submissionTime)
          yield c - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(St(si.stageId, si.name.linesIterator.next().take(160),
          wall, si.numTasks,
          m.inputMetrics.bytesRead / 1048576,
          m.shuffleReadMetrics.remoteBytesRead / 1048576 +
            m.shuffleReadMetrics.localBytesRead / 1048576,
          m.shuffleWriteMetrics.bytesWritten / 1048576))
        ()
      }
    })

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val emb = graft.Tables.embeddings(spark, dir)
    val t0 = System.nanoTime()
    val (prepared, _, release) = graft.pipelines.Corpus.prepare(docs,
      withStats = false,
      embeddings = emb, semanticEps = 0.4,
      semanticCentroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid")),
      decontamHoldout = emb.filter(col("vec_id") % 97 === 0),
      decontamEps = 0.8)
    prepared.select("split", "shard", "n_tokens", "chunk_id")
      .write.format("noop").mode("overwrite").save()
    release()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftbridge.CodegenPrewarm
      .drainListeners(spark.sparkContext)

    import scala.jdk.CollectionConverters._
    val all = stages.asScala.toSeq
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    println(f"""{"metric":"lazy_attribution","dir":"$dir","wall_sec":$wall%.2f,"stages":${all.size},"stage_wall_sum_sec":${all.map(_.wallMs).sum / 1e3}%.2f}""")
    all.sortBy(-_.wallMs).take(25).foreach { s =>
      println(s"""{"metric":"lazy_stage","id":${s.id},"wall_ms":${s.wallMs},"tasks":${s.tasks},"input_mb":${s.inputMB},"shuffle_read_mb":${s.shuffleReadMB},"shuffle_write_mb":${s.shuffleWriteMB},"site":${q(s.name)}}""")
    }
    // recompute check: repeated (site, tasks, input) signatures
    all.groupBy(s => (s.name, s.tasks, s.inputMB)).toSeq
      .filter(_._2.size > 1).sortBy(-_._2.map(_.wallMs).sum).take(10)
      .foreach { case ((site, tasks, in), g) =>
        println(s"""{"metric":"lazy_repeat","count":${g.size},"tasks":$tasks,"input_mb":$in,"wall_ms_sum":${g.map(_.wallMs).sum},"site":${q(site)}}""")
      }
    spark.stop()
  }
}
