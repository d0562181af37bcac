package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memo cache — the lifecycle home of the M7
  * temp-table-reuse frames ([[Tables]] resolved relations, the
  * activity flows frame, the text pipeline's token/pair frames).
  *
  * Lifecycle contract (stated precisely — cached DataFrames hold
  * their session through `queryExecution`, so entries DO pin a
  * session until evicted; the weak-keyed id map only guarantees the
  * id bookkeeping itself never outlives a session):
  *  - entry keys are (per-session id, key): a new session (even over
  *    the same SparkContext) sees none of an old session's frames —
  *    `newSession()`/restart cannot read stale state;
  *  - the first touch from a session registers ONE listener that
  *    evicts (and unpersists) all of that session's entries when the
  *    APPLICATION ends — the floor guarantee for batch mains (Bench,
  *    Verify, CLI), whose process exit is the session's end;
  *  - a long-lived service creating per-tenant/per-request sessions
  *    over one application MUST call [[evictSession]] when it retires
  *    a session — there is no per-session end event in Spark to hook,
  *    so un-evicted entries (and the sessions they reference) live
  *    until application end. This is the deliberate trade for keeping
  *    persisted frames reliably resident between queries.
  *
  * Entry creation uses `computeIfAbsent`, so a racing first touch
  * builds (and persists) the frame exactly once.
  */
object SessionCache {
  // Stable per-session-object id (the public API lacks a session UUID):
  // WEAK keys, so the id map itself never retains a stopped session.
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private[graft] def idOf(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)
}

final class SessionCache[K] {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(String, K), DataFrame]()
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def getOrElseUpdate(spark: SparkSession, key: K)(mk: => DataFrame): DataFrame = {
    val sid = SessionCache.idOf(spark)
    if (registered.add(sid))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(sid)
      })
    entries.computeIfAbsent((sid, key), _ => mk)
  }

  def evictSession(spark: SparkSession): Unit = evict(SessionCache.idOf(spark))

  private def evict(sid: String): Unit = {
    registered.remove(sid)
    entries.keySet.forEach { k =>
      if (k._1 == sid)
        Option(entries.remove(k)).foreach { df =>
          // the context may already be down when the app-end hook runs
          scala.util.Try(df.unpersist(blocking = false))
        }
    }
  }

  private[graft] def size: Int = entries.size
}
