package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Activity family (reference `ingest_activity_and_report.sh:20-101`)
  * and latest-bucket snapshot semantics on hand-computed fixtures.
  */
class ActivitySpec extends SparkSpec {

  private def events = {
    val ss = spark; import ss.implicits._
    Seq(
      ("w1", "in", 10.0), ("w1", "in", 5.0), ("w1", "out", 3.0),
      ("w2", "out", 7.0),
      ("w3", "other", 99.0)).toDF("wallet", "dir", "amt")
  }

  private def flows = Activity.flows(events, col("wallet"),
    col("amt").cast("decimal(18,2)"),
    inflow = col("dir") === "in", outflow = col("dir") === "out")

  test("flows computes conditional in/out sums and tx counts per entity") {
    val ss = spark; import ss.implicits._
    val got = flows.select(col("entity"), col("in_amt").cast("double"),
      col("out_amt").cast("double"), col("txs")).as[(String, Double, Double, Long)]
      .collect().toSet
    assert(got == Set(("w1", 15.0, 3.0, 3L), ("w2", 0.0, 7.0, 1L),
      ("w3", 0.0, 0.0, 1L)))
  }

  test("totals aggregates the flows frame with net = in − out") {
    val ss = spark; import ss.implicits._
    val got = Activity.totals(flows)
      .select(col("wallets"), col("total_txs"), col("total_in").cast("double"),
        col("total_out").cast("double"), col("net_flow").cast("double"))
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((3L, 5L, 15.0, 10.0, 5.0)))
  }

  test("topMovers orders by GREATEST(in,out) desc with tiebreaks") {
    val ss = spark; import ss.implicits._
    val got = Activity.topMovers(flows, 2)
      .select(col("entity"), col("max_flow").cast("double"))
      .as[(String, Double)].collect().toSeq
    assert(got == Seq(("w1", 15.0), ("w2", 7.0)))
  }

  test("latestBucket keeps exactly the max-bucket rows") {
    val ss = spark; import ss.implicits._
    val df = Seq((1L, 100L), (2L, 100L), (3L, 94L), (4L, 88L)).toDF("id", "bucket")
    val got = Snapshots.latestBucket(df, col("bucket"))
      .select(col("id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }
}
