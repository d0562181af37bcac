package graft.operators

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("co-bucketed tables join with zero shuffle exchanges and exact row parity") {
    val base = Files.createTempDirectory("bucketed").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "b_lineitem", s"$base/li", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "b_orders", s"$base/ord", "l_orderkey", 8)
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      // force execution, then audit the FINAL (AQE-resolved) plan
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      // parity with the plain (shuffling) join
      val want = li.join(ord, "l_orderkey").count()
      assert(n == want && n > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
