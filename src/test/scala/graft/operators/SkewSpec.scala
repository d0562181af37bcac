package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting must never change results — every operator is asserted
  * row-for-row against its unsalted equivalent on a deliberately
  * skewed dataset (one key holds half the rows).
  */
class SkewSpec extends SparkSpec {

  private def skewed = {
    val ss = spark; import ss.implicits._
    (1 to 2000).map { i =>
      val key = if (i % 2 == 0) "hot" else s"k${i % 37}"
      (key, i.toLong, i % 101)
    }.toDF("k", "id", "v")
  }

  test("saltedJoin equals the plain inner join on a skewed key") {
    val ss = spark; import ss.implicits._
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k5", "B")).toDF("k", "tag")
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "id", "v", "tag").as[(String, Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .select("k", "id", "v", "tag").as[(String, Long, Int, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("distinctCountSkewed equals countDistinct per key") {
    val ss = spark; import ss.implicits._
    val plain = skewed.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .as[(String, Long)].collect().toMap
    val split = Skew.distinctCountSkewed(skewed, Seq("k"), col("v"), "n", saltFactor = 8)
      .select("k", "n").as[(String, Long)].collect().toMap
    assert(split == plain)
  }
}
