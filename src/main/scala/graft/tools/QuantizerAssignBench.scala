package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** Vectors-only ASSIGNMENT microbench for the two-level quantizer —
  * the measurement behind the O(N·√k) claim
  * ([[graft.operators.Similarity.HierThreshold]] /
  * [[graft.plans.IvfAssignHier]]): at the production sizing rule
  * k = N/128, flat assignment is O(N·k) = O(N²/128) while the
  * two-level scan is O(N·√k) — but the sandbox ×30 pipeline A/B reads
  * ~2% (75k vectors ⇒ k = 586, where the asymptotic gap is noise
  * against the pipeline's other stages). This bench isolates the
  * assignment kernel at N where the gap is load-bearing.
  *
  * The quantizer is SYNTHETIC (deterministic hash-derived centroids,
  * equal-population supercells): [[graft.plans.IvfAssignHier]]'s cost
  * is fixed by its scan structure (√k supercells + superProbe member
  * lists), not by centroid geometry, and its BIT-IDENTITY to flat at
  * full super-probe is property-pinned in SimilaritySpec — so timing
  * does not need a trained artifact. Same session, warm + min-of-2,
  * ratio column (the ×R protocol); flat at the largest N is the
  * deliberately-quadratic baseline and runs once.
  *
  * Usage: `sbt "runMain graft.tools.QuantizerAssignBench [dim] [n1,n2,…] [maxFlatN]"`
  * (`maxFlatN` skips the quadratic flat baseline above that size —
  * flat at 8M/k=62500 is ~1 h by the measured N² trend; the hier
  * point alone demonstrates the linear-ish path stays tractable)
  */
object QuantizerAssignBench {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(16)
    val sizes = args.lift(1).map(_.split(",").map(_.toLong).toSeq)
      .getOrElse(Seq(500000L, 2000000L, 8000000L))
    val maxFlatN = args.lift(2).map(_.toLong).getOrElse(Long.MaxValue)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    def fvec(seed: Long): Array[Float] =
      Array.tabulate(dim) { d =>
        // deterministic, sign-varied, unit-magnitude-ish components
        val h = seed * 6364136223846793005L + d * 1442695040888963407L
        ((h >>> 16) % 2001L - 1000L).toFloat / 1000.0f
      }

    for (n <- sizes) {
      val k = math.max(16, (n / graft.operators.Similarity.AutoListSize).toInt)
      val nS = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
      val ids = Array.tabulate(k)(_.toLong)
      val vecs = Array.tabulate(k)(i => fvec(i.toLong))
      // equal-population member layout: supercell s owns the k/nS
      // contiguous centroids starting at starts(s); supervec = first
      // member (scan-structure realistic, geometry-irrelevant for
      // timing)
      val starts = Array.tabulate(nS + 1)(s => math.min(k, (s.toLong * k / nS).toInt))
        .distinct
      val nSEff = starts.length - 1
      val superVecs = Array.tabulate(nSEff)(s => vecs(starts(s)))

      val corpus = spark.range(n).select(
        transform(sequence(lit(0), lit(dim - 1)),
          d => (sin(col("id") * 31 + d)).cast("float")).as("embedding"))
        .localCheckpoint()

      def flat = corpus.select(ColumnBridge.column(graft.plans.IvfAssign(
        ColumnBridge.expression(col("embedding")), ids, vecs, 1)).as("a"))
      def hier = corpus.select(ColumnBridge.column(graft.plans.IvfAssignHier(
        ColumnBridge.expression(col("embedding")), superVecs, starts, ids,
        vecs, graft.operators.Similarity.SuperProbe, 1)).as("a"))

      def time(df: => DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // warm codegen on a 1-row slice, then measure; the quadratic
      // flat baseline at the largest N runs once, hier min-of-2
      time(hier.limit(1)); time(flat.limit(1))
      val hierSec = Seq(time(hier), time(hier)).min
      // the deliberately-quadratic flat baseline runs once past 1M —
      // its wall IS the point being demonstrated — and skips entirely
      // past maxFlatN
      val flatSec =
        if (n > maxFlatN) Double.NaN
        else if (n >= 1000000L) time(flat)
        else Seq(time(flat), time(flat)).min
      val ratio = if (flatSec.isNaN) "null" else f"${flatSec / hierSec}%.2f"
      val flatOut = if (flatSec.isNaN) "null" else f"$flatSec%.2f"
      println(s"""{"metric":"quantizer_assign","n":$n,"k":$k,"supercells":$nSEff,"dim":$dim,"flat_sec":$flatOut,"hier_sec":${f"$hierSec%.2f"},"flat_over_hier":$ratio}""")
    }
    spark.stop()
  }
}
