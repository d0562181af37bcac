package org.apache.spark.sql.graftbridge

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{CollapseCodegenStages, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Bridge into Spark's codegen internals for [[graft.Prewarm]]: Janino-
  * compile every whole-stage-codegen subtree of a query's physical
  * plan WITHOUT executing a job, populating the session-global
  * generated-class cache ([[CodeGenerator]]'s source-keyed cache) so
  * first executions skip compilation. Compilation here is exactly the
  * compilation execution would do — same source, same cache — just
  * off the critical path and parallelizable across queries.
  *
  * Under AQE the executed plan materializes codegen stages lazily per
  * query stage, so the top-level plan carries no
  * [[WholeStageCodegenExec]] yet; we approximate by running
  * [[CollapseCodegenStages]] over the adaptive input plan. With
  * `spark.sql.codegen.useIdInClassName=false` (set in GraftSession)
  * the generated source is id-free, so the per-stage sources AQE
  * generates later are textually identical to ours for matching
  * subtrees and hit the cache. Mismatches (AQE-rewritten joins,
  * runtime shuffle readers) just compile at execution as before —
  * strictly best-effort.
  */
object CodegenPrewarm {

  /** Compile all codegen subtrees of `df`'s plan; returns the number
    * compiled. Never throws — a plan that cannot pre-compile is a
    * missed optimization, not an error.
    */
  def precompile(df: DataFrame): Int = {
    try {
      val plan = df.queryExecution.executedPlan
      val target = plan match {
        case a: AdaptiveSparkPlanExec =>
          CollapseCodegenStages(new AtomicInteger(0)).apply(a.inputPlan)
        case p => p
      }
      var n = 0
      target.foreach {
        case w: WholeStageCodegenExec =>
          try { CodeGenerator.compile(w.doCodeGen()._2); n += 1 }
          catch { case _: Throwable => () }
        case _ => ()
      }
      n
    } catch { case _: Throwable => 0 }
  }

  /** Block until the listener bus has delivered every queued event —
    * lets a measuring tool ([[graft.tools.ScaleRehearsal]]) read
    * listener-accumulated metrics (stage executor peaks, spill
    * totals) that land asynchronously after an action returns. The
    * bus is `private[spark]`, hence this one-line bridge.
    */
  def drainListeners(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
