package graft.operators

import graft.SparkSpec
import graft.plans.MisraGriesSketch
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

class HeavyHittersSpec extends SparkSpec {

  private def sketch(capacity: Int) =
    MisraGriesSketch(BoundReference(0, StringType, nullable = true),
      Literal(capacity, IntegerType))

  private def feed(agg: MisraGriesSketch,
                   items: Seq[String]): scala.collection.mutable.HashMap[String, Long] = {
    var buf = agg.createAggregationBuffer()
    items.foreach { s =>
      buf = agg.update(buf, InternalRow(UTF8String.fromString(s)))
    }
    buf
  }

  test("MG keeps every item with frequency > N/m (survival bound)") {
    val agg = sketch(capacity = 3)
    // N=20: a×9, b×6, others singletons. N/m = 6.67 → 'a' must survive
    val stream = Seq.fill(9)("a") ++ Seq.fill(6)("b") ++
      Seq("c", "d", "e", "f", "g")
    val buf = feed(agg, scala.util.Random.shuffle(stream))
    assert(buf.contains("a"), s"frequency-9 item evicted from $buf")
    // weights are lower bounds: never above the true frequency
    assert(buf("a") <= 9)
    buf.get("b").foreach(w => assert(w <= 6))
  }

  test("MG merge respects capacity and preserves pointwise lower bounds") {
    val agg = sketch(capacity = 3)
    val a = feed(agg, Seq("x", "x", "x", "y", "y", "z"))
    val b = feed(agg, Seq("x", "w", "w", "w", "v"))
    val aCopy = a.clone()
    val merged = agg.merge(a, b)
    assert(merged.size <= 3, s"merge exceeded capacity: $merged")
    // x had weight in both: merged weight is within N/m of 3+1
    merged.get("x").foreach(w => assert(w <= aCopy("x") + 1))
    // serialization round-trips the merged buffer exactly
    assert(agg.deserialize(agg.serialize(merged)) == merged)
  }

  test("exactTopK matches the plain groupBy-count answer") {
    val ss = spark; import ss.implicits._
    // zipf-ish: token i appears 200/i times, i = 1..40
    val rows = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"tok$i"))
    val df = scala.util.Random.shuffle(rows).toDF("t").repartition(8)
    val viaMg = HeavyHitters.exactTopK(df, col("t"), k = 10, capacity = 64)
      .as[(String, Long)].collect().toSeq
    val exact = df.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(10)
      .as[(String, Long)].collect().toSeq
    assert(viaMg == exact)
  }

  test("exactTopKPerGroup matches per-group groupBy-count, fully distributed") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(3)
    // three groups with different zipf-ish mixes
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to 30
      _ <- 1 to (120 / i + rnd.nextInt(2))
    } yield (g, s"${g}tok$i")
    val df = scala.util.Random.shuffle(rows).toDF("g", "t").repartition(8)
    val viaMg = HeavyHitters.exactTopKPerGroup(df, col("g"), col("t"),
        k = 5, capacity = 64)
      .as[(String, String, Long, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("n").desc, col("t").asc)
    val exact = df.groupBy("g", "t").agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("g"), col("t"), col("n"), col("rnk"))
      .orderBy(col("g"), col("rnk"), col("t"))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(viaMg == exact)
  }

  test("exactTopKPerGroup refuses naming only the uncertifiable groups") {
    val ss = spark; import ss.implicits._
    // group "flat" is uniform over 100 items (uncertifiable at cap 8);
    // group "sharp" is a single repeated item (trivially certified)
    val rows = (1 to 400).map(i => ("flat", s"t${i % 100}")) ++
      (1 to 50).map(_ => ("sharp", "only"))
    val e = intercept[IllegalStateException] {
      HeavyHitters.exactTopKPerGroup(rows.toDF("g", "t"), col("g"), col("t"),
        k = 5, capacity = 8, maxCapacity = 8) // pinned: refusal contract
    }
    assert(e.getMessage.contains("flat") && !e.getMessage.contains("sharp"),
      e.getMessage)
  }

  test("null items do not poison certification (N counts non-nulls only)") {
    val ss = spark; import ss.implicits._
    // 500 nulls + 20 distinct singletons: the nulls are invisible to
    // the sketch AND the recount, so coverage must still certify
    val df = (Seq.fill(500)(null: String) ++ (1 to 20).map(i => s"t$i")).toDF("t")
    val r = HeavyHitters.exactTopK(df, col("t"), k = 5, capacity = 64)
      .as[(String, Long)].collect()
    assert(r.length == 5 && r.forall(_._2 == 1L))
  }

  test("exactTopK refuses rather than return uncertified ranks") {
    val ss = spark; import ss.implicits._
    // perfectly flat distribution, capacity far too small: the k-th
    // count can never clear N/m
    val df = (1 to 400).map(i => s"t${i % 100}").toDF("t")
    val e = intercept[IllegalStateException] {
      HeavyHitters.exactTopK(df, col("t"), k = 5, capacity = 8,
        maxCapacity = 8) // pinned: refusal contract
    }
    assert(e.getMessage.contains("capacity"), e.getMessage)
  }

  test("capacity auto-escalation certifies what a fixed capacity refuses") {
    val ss = spark; import ss.implicits._
    // flat over 100 items: cap 8 refuses (above), but escalation to
    // >=100 reaches full coverage and certifies EXACT ranks — the
    // x10-rehearsal failure mode (fixed 4096 vs 3.3M tokens), in
    // miniature. Both entry points escalate.
    val df = (1 to 400).map(i => s"t${i % 100}").toDF("t")
    val r = HeavyHitters.exactTopK(df, col("t"), k = 5, capacity = 8)
      .as[(String, Long)].collect()
    assert(r.length == 5 && r.forall(_._2 == 4L), r.mkString(","))
    val rows = (1 to 400).map(i => ("flat", s"t${i % 100}")) ++
      (1 to 50).map(_ => ("sharp", "only"))
    val g = HeavyHitters.exactTopKPerGroup(rows.toDF("g", "t"), col("g"),
        col("t"), k = 1, capacity = 8)
      .collect().map(r2 => (r2.getString(0), r2.getString(1), r2.getLong(2)))
    assert(g.contains(("sharp", "only", 50L)), g.mkString(","))
    assert(g.count(_._1 == "flat") == 1, g.mkString(","))
  }
}
