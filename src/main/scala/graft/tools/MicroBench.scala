package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Micro-benchmark main for isolated expression-level A/B timings —
  * the evidence behind "fold it into one codegen'd expression" claims
  * in BASELINE.md. Not part of the driver contract; dev tool only.
  *
  * Usage: `sbt "runMain graft.tools.MicroBench [nRows] [dim]"`
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = GraftSession.local()
    import spark.implicits._

    // deterministic synthetic corpus, materialized once
    val vecs = spark.range(n.toLong).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (sin(col("id") * 31 + d)).cast("float")).as("embedding"))
      .localCheckpoint()

    def time(label: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[microbench] $label%-28s $s%8.3f s")
      s
    }

    // warm both codegen shapes, then min-of-3 each
    def sketchNative   = vecs.select(Similarity.signSketch(col("embedding"), 16))
    def sketchComposed = vecs.select(Similarity.signSketchComposed(col("embedding"), 16))
    time("signsketch_native_warm", sketchNative)
    time("signsketch_composed_warm", sketchComposed)
    val nat = (1 to 3).map(_ => time("signsketch_native", sketchNative)).min
    val comp = (1 to 3).map(_ => time("signsketch_composed", sketchComposed)).min
    println(f"""{"metric":"signsketch_speedup","native_sec":$nat%.3f,"composed_sec":$comp%.3f,"speedup":${comp / nat}%.2f,"n":$n,"dim":$dim}""")

    // hashed-margin scoring: native digest-bytes pass vs composed
    // md5→hex→conv→element_at HOF fold, ~30 tokens/doc
    val docs = spark.range(n.toLong).select(col("id"),
      transform(sequence(lit(0), lit(29)),
        k => concat(lit("tok"), ((col("id") * 31 + k) % 5000).cast("string")))
        .as("toks"))
      .localCheckpoint()
    val w = Array.tabulate(64)(i => math.sin(i) * 2.0)
    import graft.operators.QualityClassifier
    def marginNative   = docs.select(QualityClassifier.margin(col("toks"), w, -1.0))
    def marginComposed = docs.select(QualityClassifier.marginComposed(col("toks"), w, -1.0))
    time("margin_native_warm", marginNative)
    time("margin_composed_warm", marginComposed)
    val mn = (1 to 3).map(_ => time("margin_native", marginNative)).min
    val mc = (1 to 3).map(_ => time("margin_composed", marginComposed)).min
    println(f"""{"metric":"hashed_margin_speedup","native_sec":$mn%.3f,"composed_sec":$mc%.3f,"speedup":${mc / mn}%.2f,"n":$n,"tokens_per_doc":30}""")
    spark.stop()
  }
}
