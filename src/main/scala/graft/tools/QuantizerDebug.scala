package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the two-level auto quantizer: corpus size,
  * DISTINCT vector count, trained centroid census, and list-size
  * distribution for the media feature corpus at a given fixture —
  * the numbers that decide whether the level-2 init degenerates on
  * duplicate-heavy corpora. Dev tool.
  */
object QuantizerDebug {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")

    // the media feature corpus, same derivation as MediaPipeline
    val corpus = graft.queries.MediaPipeline.mediaVecs(spark, dir)
      .select(col("embedding"))
    val n = corpus.count()
    val distinct = corpus.distinct().count()
    val k = graft.operators.Similarity.autoCentroidCount(n)
    println(s"""{"metric":"qdebug","dir":"$dir","n":$n,"distinct":$distinct,"autoK":$k}""")

    val t0 = System.nanoTime()
    val cents = graft.operators.Similarity.kmeansCentroidsAuto(corpus,
      hierThreshold = 1).localCheckpoint()
    val kGot = cents.count()
    println(f"""{"metric":"qdebug_train","k_requested":$k,"k_trained":$kGot,"train_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")

    val q = graft.operators.Similarity.collectQuantizerHier(cents)
    val assigned = corpus.select(
      explode(q.assign(col("embedding"), 1)).as("c"))
    val dist = assigned.groupBy("c").count()
      .agg(count(lit(1)).as("nonempty"), max("count").as("maxList"),
        expr("percentile_approx(count, 0.5)").as("medList"),
        expr("percentile_approx(count, 0.99)").as("p99List"))
      .collect()(0)
    println(s"""{"metric":"qdebug_lists","nonempty":${dist.get(0)},"max":${dist.get(1)},"median":${dist.get(2)},"p99":${dist.get(3)}}""")
    spark.stop()
  }
}
