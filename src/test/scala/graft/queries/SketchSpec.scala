package graft.queries

import graft.SparkSpec

/** Accuracy gate for the rows-only HLL sketch surface: the Datasketches
  * binary layout is engine-specific (no DuckDB oracle), so the estimate
  * is gated against the EXACT gated twin instead.
  */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("token_hll estimates within 5% of exact per source; union merges correctly") {
    val exact = TextPipeline.distinctTokens(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = TextPipeline.tokenHll(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(exact.nonEmpty && approx.keySet == exact.keySet + "__union__")
    for ((src, ex) <- exact) {
      val ap = approx(src)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"source $src: approx $ap vs exact $ex exceeds 5% error")
    }
    // union row: merged sketches must estimate the corpus-wide
    // cardinality (within 5% of exact) and can never undercut the
    // biggest single source by more than the error bound
    val exactAll = TextPipeline.exactDistinctTokens(spark, sf)
    val un = approx("__union__")
    assert(math.abs(un - exactAll).toDouble / exactAll <= 0.05,
      s"union: approx $un vs exact $exactAll exceeds 5% error")
    assert(un >= (exact.values.max * 0.95).toLong)
  }

  test("percentile_approx tracks the exact gated quantiles (the 100 TB path)") {
    import org.apache.spark.sql.functions._
    // accuracy=10000 → rank error ≤ n/10000, i.e. effectively exact on
    // these group sizes. The sketch returns a REAL element (no
    // interpolation), so the right contract is rank-based: the value
    // must be an order statistic within ±1 position of the target
    // rank — a relative-value bound would be wrong wherever adjacent
    // order statistics are >ε apart (small groups, heavy tails).
    val ap = graft.Tables.documents(spark, sf).groupBy(col("source"))
      .agg(percentile_approx(col("n_chars"), lit(0.9), lit(10000)).as("p90"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val groups = graft.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s2, xs) => s2 -> xs.map(_._2).sorted }
    assert(ap.keySet == groups.keySet)
    for ((src, sorted) <- groups) {
      val target = 0.9 * (sorted.length - 1)
      val allowed = (math.floor(target).toInt - 1 to
        math.ceil(target).toInt + 1)
        .filter(i => i >= 0 && i < sorted.length).map(sorted).toSet
      assert(allowed.contains(ap(src)),
        s"source $src: approx p90 ${ap(src)} not within ±1 order statistic " +
          s"of rank $target (allowed $allowed)")
    }
  }
}
