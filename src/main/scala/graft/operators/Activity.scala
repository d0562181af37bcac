package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed in/out flow aggregation — the reference's activity report
  * (`scripts/ingest_activity_and_report.sh:20-101`): restrict an event
  * stream to a sliding time window and a watched-entity set, then
  * per-entity conditional sums (inflow / outflow / tx count), grand
  * totals, and GREATEST(in,out) "top movers".
  *
  * Scale shape: the watch list is small (Top-100) → broadcast
  * left-semi join, so the big fact table never shuffles for the
  * restriction; the per-entity aggregate is a single hash aggregate
  * with map-side partials.
  */
object Activity {

  /** Per-entity flows: groupBy(entity).agg(in, out, txs) where `inflow`
    * / `outflow` are predicate columns selecting which rows count each
    * way (reference A2, `ingest_activity_and_report.sh:39-45` — the
    * `ELSE 0` convention, which makes empty groups impossible rather
    * than null).
    */
  def flows(events: DataFrame, entity: Column, amount: Column,
            inflow: Column, outflow: Column): DataFrame =
    events.groupBy(entity.as("entity"))
      .agg(
        sum(when(inflow, amount).otherwise(lit(0))).as("in_amt"),
        sum(when(outflow, amount).otherwise(lit(0))).as("out_amt"),
        count(lit(1)).as("txs"))

  /** Grand totals over a [[flows]] result (reference A3,
    * `ingest_activity_and_report.sh:47-54`): wallet count, total txs,
    * total in/out, net = in − out. COALESCE(…,0) matches the empty-
    * window case.
    */
  def totals(flowsDf: DataFrame): DataFrame =
    flowsDf.agg(
      count(lit(1)).as("wallets"),
      coalesce(sum(col("txs")), lit(0L)).as("total_txs"),
      coalesce(sum(col("in_amt")), lit(0)).as("total_in"),
      coalesce(sum(col("out_amt")), lit(0)).as("total_out"))
      .withColumn("net_flow", col("total_in") - col("total_out"))

  /** Top movers (reference W2): GREATEST(in,out) as max_flow, order
    * desc nulls last with txs / entity tiebreaks, limit k. Compiles to
    * TakeOrderedAndProject (distributed top-K, no global sort).
    */
  def topMovers(flowsDf: DataFrame, k: Int): DataFrame =
    flowsDf.withColumn("max_flow", greatest(col("in_amt"), col("out_amt")))
      .orderBy(col("max_flow").desc_nulls_last, col("txs").desc, col("entity").asc)
      .limit(k)
}
