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
    spark.stop()
  }
}
