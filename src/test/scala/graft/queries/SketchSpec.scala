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
}
