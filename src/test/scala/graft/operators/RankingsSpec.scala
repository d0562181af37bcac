package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RANK semantics per reference `sql/top100_compute.sql:17-18,29`:
  * ties share a rank and create gaps (never ROW_NUMBER/DENSE_RANK).
  */
class RankingsSpec extends SparkSpec {

  private def holders = {
    val ss = spark; import ss.implicits._
    Seq(("t1", "a", 100.0), ("t1", "b", 100.0), ("t1", "c", 90.0),
      ("t1", "d", 80.0), ("t2", "e", 50.0)).toDF("token", "addr", "bal")
  }

  test("RANK ties share a rank and create a gap (ordering on bal only)") {
    val ss = spark; import ss.implicits._
    val r = Rankings.topKPerGroup(holders, Seq(col("token")),
      Seq(col("bal").desc), k = 100)
      .select(col("token"), col("addr"), col("rnk")).as[(String, String, Int)]
      .collect().toSet
    assert(r == Set(("t1", "a", 1), ("t1", "b", 1), ("t1", "c", 3),
      ("t1", "d", 4), ("t2", "e", 1)))
  }

  test("with the unique-addr tiebreak (reference W1 ordering) ranks are dense") {
    val ss = spark; import ss.implicits._
    val r = Rankings.topKPerGroup(holders, Seq(col("token")),
      Seq(col("bal").desc, col("addr").asc), k = 100)
      .filter(col("token") === "t1")
      .select(col("addr"), col("rnk")).as[(String, Int)].collect().toSet
    assert(r == Set(("a", 1), ("b", 2), ("c", 3), ("d", 4)))
  }

  test("k cutoff filters on rank, so a tie straddling k keeps both") {
    val ss = spark; import ss.implicits._
    val r = Rankings.topKPerGroup(holders, Seq(col("token")),
      Seq(col("bal").desc), k = 2)
      .select(col("addr")).as[String].collect().toSet
    // ranks: a=1, b=1, c=3 → k=2 keeps exactly the tied pair
    assert(r == Set("a", "b", "e"))
  }

  test("topK order-by-limit returns the global top rows") {
    val ss = spark; import ss.implicits._
    val r = Rankings.topK(holders, Seq(col("bal").desc, col("addr").asc), 3)
      .select(col("addr")).as[String].collect().toSeq
    assert(r == Seq("a", "b", "c"))
  }

  test("percentRankBucketed ≡ the per-group percent_rank window, bit-exact, any bucketing") {
    val ss = spark; import ss.implicits._
    import org.apache.spark.sql.expressions.Window
    // deliberately skewed groups: one giant source (80%), two small
    // ones incl. a 1-row group (percent_rank = 0 convention), heavy
    // score ties that straddle bucket boundaries
    val rows = (1L to 800L).map(id => ("giant", id, ((id * 37) % 25) * 1000L)) ++
      (801L to 999L).map(id => ("small", id, ((id * 13) % 7) * 1000L)) :+
      (("solo", 1000L, 42L))
    val docs = rows.toDF("source", "doc_id", "score_micro")
    val w = Window.partitionBy(col("source")).orderBy(col("score_micro"))
    val want = docs
      .withColumn("pctile_micro",
        round(percent_rank().over(w) * 1e6).cast("long"))
      .select("doc_id", "pctile_micro").as[(Long, Long)].collect().toMap
    for (nBuckets <- Seq(1, 7, 1000)) {
      val got = Rankings.percentRankBucketed(docs.repartition(13),
          "source", "score_micro", nBuckets = nBuckets)
        .select("doc_id", "pctile_micro").as[(Long, Long)].collect().toMap
      assert(got == want, s"nBuckets=$nBuckets diverged from the window form")
    }
    // the scale contract: no per-group-only window anywhere — every
    // corpus-side window partitions by (group, bucket)
    val plan = Rankings.percentRankBucketed(docs, "source", "score_micro")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percent_rank"),
      "bucketed form must not fall back to the built-in window function")
  }
}
