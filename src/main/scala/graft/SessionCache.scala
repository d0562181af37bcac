package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memo cache — the lifecycle home of the M7
  * temp-table-reuse frames ([[Tables]] resolved relations, the
  * activity flows frame, the text pipeline's token/pair frames).
  *
  * Lifecycle contract:
  *  - entries key on a per-session id held in a WEAK-keyed side map,
  *    never on the session object, so the cache retains NO strong
  *    reference to a stopped session;
  *  - a new session (even over the same SparkContext) sees none of an
  *    old session's frames — `newSession()`/restart cannot leak state;
  *  - the first touch from a session registers ONE listener that
  *    evicts (and unpersists) all of that session's entries when the
  *    application ends, so a long-lived multi-session service does not
  *    accumulate dead frames;
  *  - [[evictSession]] is the explicit per-batch-cycle hook for
  *    services that outlive their working set.
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
