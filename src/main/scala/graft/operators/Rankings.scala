package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking / top-K operators.
  *
  * Reference semantics (`sql/top100_compute.sql:17-18,29`): `RANK()` —
  * not ROW_NUMBER/DENSE_RANK — over `ORDER BY balance DESC, holder ASC`,
  * then `WHERE rnk <= k`. Ties share a rank and create gaps.
  *
  * Scale note (SURVEY §2.5 W1 note c): the reference's window has no
  * PARTITION BY because its input is pre-filtered to one (token,
  * bucket). A global window is a single-partition sort — it cannot
  * scale. [[topKPerGroup]] therefore always partitions the window by
  * the group keys, which at 100 TB shuffles once on the group key and
  * ranks each group in parallel.
  */
object Rankings {

  /** RANK-based top-K within each group. `ordering` must be a total
    * order (include a unique tiebreak column) for deterministic output.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column],
                   ordering: Seq[Column], k: Int,
                   rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(groupCols: _*).orderBy(ordering: _*)
    df.withColumn(rankCol, rank().over(w)).filter(col(rankCol) <= k)
  }

  /** Global order-by + limit top-K (reference W2 "top movers",
    * `ingest_activity_and_report.sh:92-100`). Spark compiles this to
    * TakeOrderedAndProject — a true distributed top-K (per-partition
    * heap + driver merge), never a full global sort.
    */
  def topK(df: DataFrame, ordering: Seq[Column], k: Int): DataFrame =
    df.orderBy(ordering: _*).limit(k)
}
