package graft.pipelines

import graft.functions.TextFns
import graft.operators.{Dedup, Packing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus preparation — the composed "switch to this
  * library" entry point over the individually-gated stages: exact
  * dedup → near-dup cluster pruning → quality filtering → stable
  * split → token-budget packing. Every stage is the same operator the
  * oracle gates individually (`dedup_exact`, `dedup_components`,
  * `text_stats`, `doc_sample`, `seq_pack`), so the composition adds
  * no new semantics — only the wiring a production pipeline needs.
  *
  * Scale shape: one tokenization pass staged up front and reused by
  * quality and packing; near-dup pruning joins on the pair graph's
  * component labels (log-diameter contraction), never materializing
  * anything quadratic; packing is per-shard windowed cumsum — no
  * global window anywhere.
  */
object Corpus {

  final case class PrepareStats(input: Long, afterExact: Long,
                                afterNearDup: Long, afterQuality: Long)

  /** @param docs       (doc_id: long, text: string) + any passthrough columns
    * @param jaccard    near-dup threshold on word-trigram Jaccard
    * @param minQuality quality-score floor (TextFns.qualityScoreOf ∈ [0,1])
    * @param budget     tokens per packed chunk
    * @param nShards    parallel packing streams
    * @param withStats  per-stage row accounting costs ONE extra action
    *                   per stage — priceless in validation, four full
    *                   passes you don't want on a 100 TB production
    *                   run (pass false → stats are -1, pipeline stays
    *                   one lazy plan until the caller's write)
    * @return (prepared frame with split/shard/chunk assignment, per-stage row accounting)
    */
  def prepare(docs: DataFrame, jaccard: Double = 0.5, minQuality: Double = 0.3,
              budget: Int = 2048, nShards: Int = 8,
              withStats: Boolean = true): (DataFrame, PrepareStats) = {
    def tally(df: DataFrame): Long = if (withStats) df.count() else -1L
    val input = tally(docs)

    // 1. exact dedup: keep the min doc_id of each normalized-text
    //    group. Tokens are staged HERE, before the checkpoint, so the
    //    single tokenization pass is materialized once and reused by
    //    near-dup shingling, the quality score, and packing.
    val exact = Dedup.exactSurvivors(docs, col("doc_id"), col("text"))
      .withColumn("__toks", TextFns.tokens(col("text")))
      .localCheckpoint() // three downstream consumers; truncate lineage once
    val nExact = tally(exact)

    // 2. near-dup pruning: pair graph → components → keep each
    //    component's minimum id (the same keep rule as exact dedup)
    val pairs = Dedup.ngramJaccardPairsOfTokens(
      exact.select(col("doc_id"), col("__toks")), n = 3, threshold = jaccard)
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc_id"))
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    val nNearDup = tally(nearDeduped)

    // 3. quality floor over the staged tokens
    val scored = nearDeduped
      .withColumn("quality", TextFns.qualityScoreOf(col("text"), col("__toks")))
      .filter(col("quality") >= minQuality)
    val nQuality = tally(scored)

    // 4. stable split + 5. token-budget packing (train split packs;
    //    val/test keep their assignment unpacked is a policy choice —
    //    here all splits pack, callers filter)
    val prepared = Packing.packByTokenBudget(
      scored.withColumn("split", TextFns.stableSplit(col("text"))),
      col("doc_id"), size(col("__toks")), budget, nShards)
      .drop("__toks")

    (prepared, PrepareStats(input, nExact, nNearDup, nQuality))
  }
}
