package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines: assign documents
  * to fixed-token-budget chunks ("concat and chunk") by cumulative
  * token count.
  *
  * Scale shape: docs are SHARDED (here by `pmod(id, nShards)`; any
  * distribution key works) and each shard packs independently under a
  * per-shard running total — the window is `partitionBy(shard)`, never
  * global, so 1000 executors pack 1000 shards with no coordination and
  * no single-partition window (the round-1 scale-killer class). A doc
  * lands in the chunk its first token falls into:
  * `chunk = floor(cum_before / budget)` — deterministic integer
  * arithmetic, portable to any SQL oracle as a windowed SUM.
  */
object Packing {

  /** @param docs       input frame
    * @param idCol      unique orderable id (pack order within shard)
    * @param nTokensCol per-doc token count
    * @param budget     tokens per packed chunk (e.g. 4096)
    * @param nShards    parallel packing streams
    * @return input + (shard, n_tokens, cum_tokens, chunk_id)
    */
  def packByTokenBudget(docs: DataFrame, idCol: Column, nTokensCol: Column,
                        budget: Int, nShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(idCol, lit(nShards)).cast("int"))
      .withColumn("n_tokens", nTokensCol.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("chunk_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
  }
}
