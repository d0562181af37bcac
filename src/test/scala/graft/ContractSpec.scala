package graft

/** Driver-contract invariants, asserted in CI so drift fails a spec
  * run instead of a driver round: every oracle belongs to a declared
  * query, the rows-only set is exactly the documented
  * approximate-/binary-by-construction queries (each carrying a spec
  * and, where possible, a hash-gated exact twin), and every query
  * builds against the smoke fixture.
  */
class ContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the rows-only set is exactly the documented one") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // media_knn_ivf: approximate by construction (IVF probe of the
    // histogram space); floor-gated ≥0.75 recall@5 against the
    // hash-gated brute-force exact twin `media_knn` (QualityMetrics;
    // MediaSpec pins the probe/rank contract).
    // minhash_indexed: xxhash64-based like minhash_pairs; probe ≡
    // batch-sweep is spec-proven exactly (DedupSpec) and the probe
    // path carries its own recall floor (minhash_indexed_recall).
    // media_knn_ivf_auto / semantic_dedup_auto: the TRAINED-quantizer
    // production defaults (round 14) — no portable oracle can restate
    // a k-means result; floor-gated per round (auto recall@5 ≥ 0.75
    // vs the exact twin; semantic_dedup_auto_fit_ratio ≥ 1.0 — mean
    // assigned-centroid cosine of the trained quantizer relative to
    // the fixed 8-seed twin, i.e. k-means fitness — QualityMetrics).
    assert(rowsOnly == Set("minhash_pairs", "simhash_pairs", "knn_lsh",
      "knn_ivf", "token_hll", "bpe_tokens", "media_knn_ivf",
      "minhash_indexed", "media_knn_ivf_auto", "semantic_dedup_auto"),
      s"rows-only drift — every addition here needs a spec + a written reason: $rowsOnly")
  }

  test("every declared query builds and resolves a non-empty schema") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$name resolves to an empty schema")
    }
  }

  test("the flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** The five rows-only approximate queries carry FLOOR-GATED numeric
    * quality: recall vs their hash-gated exact twins (+ HLL accuracy
    * vs the exact distinct counts). A recall regression here fails CI
    * exactly like a hash mismatch would — see QualityMetrics for the
    * per-metric derivations and calibration; graft.Quality dumps the
    * same table per round as QUALITY_r{N}.json.
    */
  test("every approximate query clears its quality floor") {
    val rows = queries.QualityMetrics.metrics(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == queries.QualityMetrics.floors.keySet,
      "quality metric set drifted from the declared floors")
    val failing = rows.filterNot(_.getBoolean(5))
      .map(r => s"${r.getString(0)} = ${r.getDouble(1)} < floor ${r.getDouble(4)}")
    assert(failing.isEmpty, s"quality floors violated: ${failing.mkString("; ")}")
  }
}
