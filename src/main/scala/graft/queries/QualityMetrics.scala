package graft.queries

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quantified quality gates for the rows-only queries — the surfaces
  * whose VALUES no portable oracle can restate (xxhash64-based
  * candidate generation, engine-specific HLL layout, the BPE greedy
  * merge loop), so their correctness otherwise rests on specs alone. Each metric
  * is a deterministic Spark-side relation comparing the approximate
  * gated query against its exact gated twin:
  *
  *  - `minhash_recall`:  |minhash_pairs ∩ ngram_jaccard| / |ngram_jaccard|
  *    — the fraction of true θ≥0.5 trigram-Jaccard pairs the
  *    32×4-band MinHash candidate pass surfaces.
  *  - `simhash_recall`:  pigeonhole pairs vs the brute-force
  *    Hamming-≤6 pair set over the IDENTICAL 64-bit fingerprints
  *    ([[Dedup.simhashSignaturesOfTokens]]) — isolates exactly the
  *    loss the hot-bucket cap (maxPieceFreq) can introduce. The truth
  *    side is an O(n²) sketch-pair scan — 8-byte signatures, so 5k
  *    docs ⇒ 12.5M XOR+popcounts; a gate computation, not a pipeline
  *    operator (the pigeonhole path exists precisely to avoid this at
  *    corpus scale).
  *  - `knn_lsh_recall@5` / `knn_ivf_recall@5`: per-(query, neighbor)
  *    overlap with the hash-gated brute-force top-5.
  *  - `token_hll_accuracy`: 1 − max relative error of the HLL
  *    estimates vs the exact distinct counts, across every per-source
  *    row AND the union row.
  *
  * All metrics are oriented so BIGGER IS BETTER and gated by a floor
  * (`pass = value ≥ floor`), so one schema serves the whole table and
  * a regression in any of them is a uniform `pass = false`. Floors
  * sit ~10-15 points under the measured sf0.001–0.1 values (which are
  * 1.0 for everything but the knn paths on this corpus) — tight
  * enough that a parameter or logic regression trips them, loose
  * enough that seed-free hash determinism keeps them stable.
  *
  * [[graft.Quality]] dumps this table per round as QUALITY_r{N}.json;
  * ContractSpec asserts every floor in CI.
  */
object QualityMetrics {

  /** Per-metric floors (min acceptable value). Calibration, measured
    * across sf0.001/sf0.01/sf0.1: minhash 1.0 everywhere; simhash
    * 0.97–0.994 (the sub-pigeonhole recursion — the flat round-6 cap
    * measured 0.68 at sf0.1); lsh 0.94 at sf0.1 since the 3-table
    * amplification (single-table measured 0.56–0.70 in rounds 7-8);
    * ivf (trained quantizer) 0.68–0.80 at nAssign = 1, 0.9 at sf0.1
    * with nAssign = 2 multi-assignment (floor raised 0.6 → 0.75 in
    * round 9); hll 1.0 at these cardinalities.
    */
  val floors: Map[String, Double] = Map(
    "minhash_recall" -> 0.9,
    "minhash_indexed_recall" -> 0.9,
    "simhash_recall" -> 0.9,
    "knn_lsh_recall@5" -> 0.7,
    "knn_ivf_recall@5" -> 0.75,
    "media_knn_ivf_recall@5" -> 0.75,
    "media_knn_ivf_auto_recall@5" -> 0.75,
    "semantic_dedup_auto_fit_ratio" -> 1.0,
    "audio_phash_capped_recall" -> 0.9,
    "audio_phash_capped_recall_mix" -> 0.9,
    "token_hll_accuracy" -> 0.95,
    "bpe_compression" -> 1.5)

  /** Recall of `cand` over `truth`, both keyed (id_a, id_b), as a
    * one-row relation. Left-semi intersection then two tiny one-row
    * aggregates — no driver-side set math.
    */
  private def recallOf(name: String, cand: DataFrame, truth: DataFrame): DataFrame = {
    val t = truth.select(col("id_a"), col("id_b"))
    val hit = t.join(cand.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_semi")
    hit.agg(count(lit(1)).as("numer"))
      .crossJoin(t.agg(count(lit(1)).as("denom")))
      .select(lit(name).as("metric"),
        round(col("numer").cast("double") / col("denom"), 6).as("value"),
        col("numer"), col("denom"))
  }

  private def keyed(df: DataFrame, a: String, b: String): DataFrame =
    df.select(col(a).as("id_a"), col(b).as("id_b"))

  /** True Hamming-≤maxDist pair set by brute force over the simhash
    * fingerprints — quadratic in documents but linear in BYTES (8 per
    * signature), used only as gate truth.
    */
  private def simhashTruth(s: SparkSession, dir: String, maxDist: Int): DataFrame = {
    val sig = Dedup.simhashSignaturesOfTokens(
      TextPipeline.tokenizedDocs(s, dir).select(col("doc_id"), col("__toks")))
    val a = sig.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sig.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Quantizer FITNESS of the auto-trained SemDeDup production path
    * relative to the hash-gated fixed-quantizer twin: mean
    * vector-to-assigned-centroid cosine (the k-means objective under
    * cosine — already a column of both decision frames, so the
    * metric is two one-row aggregates) as a ratio auto / fixed. A
    * TRAINED quantizer at [[graft.operators.Similarity
    * .autoCentroidCount]] size must fit the corpus at least as well
    * as 8 arbitrary seed vectors at ANY corpus size, so the ratio is
    * scale-stable ≥ 1 (measured: 1.75 at sf0.001, 1.69 at sf0.01,
    * 2.61 at the ×10 fixture — it RISES with corpus size as the
    * sizing rule grants more centroids), and a k-means trainer
    * regression — untrained/garbage/dead centroids, broken
    * assignment — collapses it toward or below the fixed baseline. This is deliberately NOT a pair-blocking recall: at a
    * loose eps the co-clustered-pair count falls mechanically as the
    * sizing rule grows the cluster count (the designed
    * constant-list-population trade), so a recall ratio fails at ×R
    * without any regression; fitness measures what the trainer
    * actually optimizes. End-to-end ANN quality of the same trained
    * family is gated by `media_knn_ivf_auto_recall@5`; the sizing
    * rule itself is spec-pinned (SimilaritySpec).
    */
  private def semanticAutoFitRatio(s: SparkSession, dir: String): DataFrame = {
    val auto = TextPipeline.semanticDedupAutoQ(s, dir)
      .agg(avg(col("cent_cos")).as("__a"))
    val fixed = TextPipeline.semanticDedupQ(s, dir)
      .agg(avg(col("cent_cos")).as("__f"))
    // the ratio is only well-conditioned when the fixed baseline's
    // mean cosine is meaningfully positive — 8 arbitrary seed vectors
    // can in principle land near-orthogonal to a corpus (mean ≈ 0 or
    // < 0), where a/f explodes or flips sign and a BETTER auto
    // quantizer could read below the floor (or a worse one above it).
    // Degenerate branch: fall back to the difference sign — auto at
    // least as fit as fixed passes exactly at the 1.0 floor, worse
    // fails at 0.0. The 1e-6 cutoff matches the micro-rounding
    // resolution of the reported numer/denom columns.
    auto.crossJoin(fixed)
      .select(lit("semantic_dedup_auto_fit_ratio").as("metric"),
        when(col("__f") > lit(1e-6), round(col("__a") / col("__f"), 6))
          .otherwise(when(col("__a") >= col("__f"), lit(1.0)).otherwise(lit(0.0)))
          .as("value"),
        round(col("__a") * 1e6).cast("long").as("numer"),
        round(col("__f") * 1e6).cast("long").as("denom"))
  }

  /** HLL accuracy: 1 − max over (per-source rows + union row) of
    * |approx − exact| / exact.
    */
  private def hllAccuracy(s: SparkSession, dir: String): DataFrame = {
    val toks = TextPipeline.tokenizedDocs(s, dir)
      .select(col("source"), explode(col("__toks")).as("token"))
    val exact = toks.groupBy(col("source"))
      .agg(countDistinct(col("token")).as("exact"))
      .unionByName(toks.agg(countDistinct(col("token")).as("exact"))
        .select(lit("__union__").as("source"), col("exact")))
    TextPipeline.tokenHll(s, dir).join(exact, "source")
      .agg(
        round(lit(1.0) - max(abs(col("approx_distinct") - col("exact"))
          / col("exact")), 6).as("value"),
        count(lit(1)).as("denom"))
      .select(lit("token_hll_accuracy").as("metric"), col("value"),
        lit(null).cast("long").as("numer"), col("denom"))
  }

  /** BPE compression: corpus characters (whitespace included) per
    * learned-BPE token — how much text one learned token covers on
    * average. A merge-table regression (empty table, broken encode
    * loop, broken trainer) collapses this toward ~1.2 (char-level
    * tokenization: every non-space char its own token); a healthy
    * 256-merge table on this corpus measures well above the 1.5
    * floor.
    */
  private def bpeCompression(s: SparkSession, dir: String): DataFrame =
    TextPipeline.bpeTokens(s, dir)
      .agg(
        round(sum(col("n_chars")).cast("double")
          / sum(col("n_bpe_learned")), 6).as("value"),
        count(lit(1)).as("denom"))
      .select(lit("bpe_compression").as("metric"), col("value"),
        lit(null).cast("long").as("numer"), col("denom"))

  /** The full quality table: (metric, value, numer, denom, floor,
    * pass), one row per gated approximate surface.
    */
  def metrics(s: SparkSession, dir: String): DataFrame = {
    val rows = Seq(
      bpeCompression(s, dir),
      recallOf("minhash_recall",
        TextPipeline.minhashPairs(s, dir),
        TextPipeline.ngramPairs05(s, dir)),
      // indexed-probe path: truth is the exact θ≥0.5 pair set
      // restricted to (batch, corpus) crossings and oriented
      // batch-first to match the probe's (probe_id, index_id) keying
      recallOf("minhash_indexed_recall",
        keyed(TextPipeline.minhashIndexed(s, dir), "probe_id", "index_id"),
        TextPipeline.ngramPairs05(s, dir)
          .filter((col("id_a") % 10 === 0) =!= (col("id_b") % 10 === 0))
          .select(
            when(col("id_a") % 10 === 0, col("id_a")).otherwise(col("id_b")).as("id_a"),
            when(col("id_a") % 10 === 0, col("id_b")).otherwise(col("id_a")).as("id_b"))),
      recallOf("simhash_recall",
        TextPipeline.simhashPairs(s, dir),
        simhashTruth(s, dir, maxDist = 6)),
      recallOf("knn_lsh_recall@5",
        keyed(TextPipeline.knnLsh(s, dir), "query_id", "neighbor_id"),
        keyed(TextPipeline.knnBruteforce(s, dir), "query_id", "neighbor_id")),
      recallOf("knn_ivf_recall@5",
        keyed(TextPipeline.knnIvf(s, dir), "query_id", "neighbor_id"),
        keyed(TextPipeline.knnBruteforce(s, dir), "query_id", "neighbor_id")),
      recallOf("media_knn_ivf_recall@5",
        keyed(MediaPipeline.mediaKnnIvf(s, dir), "query_id", "neighbor_id"),
        keyed(MediaPipeline.mediaKnn(s, dir), "query_id", "neighbor_id")),
      // the auto-quantizer PRODUCTION paths (round-14): the fixed
      // quantizers above stay for cross-round comparability; these
      // gate the documented defaults a real deployment runs, so a
      // sizing-rule or trainer regression trips the round artifact
      // instead of shipping silently between ×R rehearsals
      recallOf("media_knn_ivf_auto_recall@5",
        keyed(MediaPipeline.mediaKnnIvfAuto(s, dir), "query_id", "neighbor_id"),
        keyed(MediaPipeline.mediaKnn(s, dir), "query_id", "neighbor_id")),
      semanticAutoFitRatio(s, dir),
      // the CAPPED acoustic path's recall seam (round-16): the
      // production default caps hot band pieces (maxPieceFreq = 1000,
      // the hammingPairsOfSignatures default) because energy-envelope
      // hashes are the fingerprint family's low-entropy member — the
      // uncapped ×30 sweep is output-bound by construction (BASELINE
      // negative result). This floor gates what that cap can LOSE:
      // capped pairs vs the uncapped exact sweep over the identical
      // fingerprints (the simhash_recall pattern; the truth side is
      // the gated media_audio_phash itself, feasible wherever the
      // round artifact runs — at ×R the truth is pair-volume-bound
      // and the sweep documents the cost instead of skipping the
      // metric silently)
      recallOf("audio_phash_capped_recall",
        MediaPipeline.audioPhashPairsOf(s, dir, maxPieceFreq = 1000L),
        MediaPipeline.mediaAudioPhash(s, dir)),
      // the same cap on the REALISTIC entropy class (round 16): the
      // stub metric above quantifies the adversarial bound — on the
      // sawtooth's collapsed fingerprint space every band piece goes
      // hot and the cap necessarily sheds candidates (measured 0.21
      // at ×10, the boundedness-over-completeness trade the ×30
      // negative result documents). Mix-derived clips carry
      // independent fingerprints per seed, so here the SAME cap at
      // the SAME radius must cost nothing — the floor that holds at
      // every scale on the corpus class production actually ingests.
      recallOf("audio_phash_capped_recall_mix",
        MediaPipeline.audioMixPhashPairsOf(s, dir, maxPieceFreq = 1000L),
        MediaPipeline.audioMixPhashPairsOf(s, dir,
          maxPieceFreq = Long.MaxValue)),
      hllAccuracy(s, dir))
    val all = rows.reduce(_ unionByName _)
    val floorCol = floors.foldLeft(lit(Double.NaN)) { case (acc, (m, f)) =>
      when(col("metric") === m, lit(f)).otherwise(acc)
    }
    all.withColumn("floor", floorCol)
      .withColumn("pass", col("value") >= col("floor"))
      .orderBy(col("metric"))
  }
}
