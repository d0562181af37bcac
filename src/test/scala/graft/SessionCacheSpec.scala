package graft

import org.apache.spark.sql.functions._

/** Lifecycle contract of the M7 memo caches ([[SessionCache]]):
  * per-session isolation (a new session never reuses an old session's
  * frames), bounded growth (repeated touches do not add entries), and
  * eviction that actually unpersists.
  */
class SessionCacheSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("table relations memoize within a session and never leak across sessions") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val t1a = Tables.table(s1, dir, "nation")
    val t1b = Tables.table(s1, dir, "nation")
    assert(t1a eq t1b, "same session + dir + table must memo-hit")
    val t2 = Tables.table(s2, dir, "nation")
    assert(!(t2 eq t1a), "a NEW session must resolve its own relation, not reuse a stale one")
    assert(t2.count() == t1a.count())
    Tables.evictSession(s1)
    Tables.evictSession(s2)
  }

  test("repeated touches do not grow the cache; evictSession removes exactly that session's entries") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    Tables.evictSession(s1); Tables.evictSession(s2)
    val base = Tables.cacheSize
    for (_ <- 1 to 5) Tables.table(s1, dir, "region")
    assert(Tables.cacheSize == base + 1, "5 touches of one relation must add ONE entry")
    Tables.table(s1, dir, "nation")
    Tables.table(s2, dir, "region")
    assert(Tables.cacheSize == base + 3)
    Tables.evictSession(s1)
    assert(Tables.cacheSize == base + 1, "evicting s1 must keep s2's entry")
    val again = Tables.table(s1, dir, "region")
    assert(again.count() > 0, "an evicted session re-resolves cleanly")
    Tables.evictSession(s1); Tables.evictSession(s2)
  }

  test("a persisted pipeline frame is unpersisted by eviction") {
    val s1 = spark.newSession()
    // build the persisted flows frame for this session
    val before = graft.queries.Relational.activityFlows(s1, dir).count()
    assert(before >= 0)
    graft.queries.Relational.evictFlowsCache(s1)
    // a fresh call rebuilds without error (and re-persists)
    val after = graft.queries.Relational.activityFlows(s1, dir).count()
    assert(after == before)
    graft.queries.Relational.evictFlowsCache(s1)
    Tables.evictSession(s1)
  }

  test("session ids are stable per session object and distinct across sessions") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    assert(SessionCache.idOf(s1) == SessionCache.idOf(s1))
    assert(SessionCache.idOf(s1) != SessionCache.idOf(s2))
    assert(SessionCache.idOf(spark) != SessionCache.idOf(s1))
  }
}
