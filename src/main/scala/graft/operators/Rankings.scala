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

  /** Exact per-group percent_rank WITHOUT a per-group window — the
    * scale-safe form of
    * `percent_rank() OVER (PARTITION BY group ORDER BY score)`.
    * A window partition is ONE task: on the corpora this calibration
    * exists for (FineWeb-style per-dump normalization, where a single
    * crawl can be half of 100 TB) the plain window serializes the
    * giant source onto one executor. Here the giant source instead
    * decomposes into ≤ nBuckets+1 parallel slices:
    *
    *  1. scores coarse-bucket into order-preserving integer ranges
    *     (one global min/max agg — a bucket boundary can never split
    *     a score tie, so per-bucket ranks compose exactly);
    *  2. per-(group, bucket) counts aggregate once; the cumulative
    *     below-bucket offset and the group total come from a window
    *     over THAT table (≤ groups·(nBuckets+1) rows — the tiny
    *     cum-table, broadcast back);
    *  3. each row's rank = offset + its rank within (group, bucket) —
    *     a window whose partitions are ~1/nBuckets of a group, so a
    *     giant group runs as ~nBuckets parallel tasks.
    *
    * percent_rank semantics are reproduced bit-exactly: ties share a
    * rank (rank(), not row_number), pctile = (rank−1)/(n−1) in double
    * with the same operation order as the built-in, and a 1-row group
    * scores 0 (the built-in's convention). `scoreCol` must be a
    * non-null integral column (the engine's micro convention) so
    * bucket arithmetic and ordering cannot disagree.
    *
    * Group-count contract: the cum-table is groups·nBuckets rows and
    * broadcast — calibration groups are crawls/dumps (dozens), never
    * an unbounded key.
    *
    * DETERMINISM REQUIREMENT (self-contained form): the staged pin is
    * released on return, so the scored projection recomputes per
    * consumer materialization while the cum-table constants were
    * derived from the first evaluation — source and score expression
    * must be deterministic, or the assigned percentiles silently skew.
    * Non-deterministic sources use
    * [[percentRankBucketedReleasable]] and release after materializing.
    *
    * @return input + `outCol` = round(percent_rank · 1e6) as long
    */
  def percentRankBucketed(docsIn: DataFrame, partCol: String,
                          scoreCol: String,
                          outCol: String = "pctile_micro",
                          nBuckets: Int = 1000): DataFrame = {
    // self-contained form: the staged pin is released on return —
    // the returned plan recomputes the (narrow) scored projection at
    // materialization (cum-table side + probe side). Callers with an
    // expensive score chain use [[percentRankBucketedReleasable]]
    // and release after materializing (the Corpus.prepare lifecycle).
    val (ranked, release) =
      percentRankBucketedReleasable(docsIn, partCol, scoreCol, outCol, nBuckets)
    release()
    ranked
  }

  /** [[percentRankBucketed]] with the staged-frame pin surfaced: the
    * scored projection is persisted (MEMORY_AND_DISK — lineage kept,
    * so an executor loss recomputes lost blocks rather than failing
    * the job at the 100 TB target; localCheckpoint's truncated
    * lineage could not) and the caller unpersists via the returned
    * release handle AFTER materializing the result.
    */
  def percentRankBucketedReleasable(docsIn: DataFrame, partCol: String,
                                    scoreCol: String,
                                    outCol: String = "pctile_micro",
                                    nBuckets: Int = 1000)
      : (DataFrame, () => Unit) = {
    // one pinned materialization serves all consumers (min/max agg,
    // cum-table aggregate, probe side) — the bucketed decomposition's
    // consistency contract; callers pass the narrow scored projection
    val docs = docsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val release = () => { docs.unpersist(blocking = false); () }
    val agg = docs.agg(min(col(scoreCol).cast("long")),
      max(col(scoreCol).cast("long"))).head()
    if (agg.isNullAt(0))
      return (docs.withColumn(outCol, lit(null).cast("long")), release)
    val (mn, mx) = (agg.getLong(0), agg.getLong(1))
    val width = math.max(1L, (mx - mn) / nBuckets + 1)
    def bucketOf = floor((col(scoreCol).cast("long") - lit(mn)) / lit(width))
      .cast("long").as("__bucket")
    // the cum-table: per-(group, bucket) counts, then offset/total via
    // a window over the TABLE (groups·nBuckets rows, not the corpus)
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.select(col(partCol), bucketOf)
      .groupBy(col(partCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__n")).over(Window.partitionBy(col(partCol))))
      .select(col(partCol), col("__bucket"), col("__off"), col("__tot"))
    // fine rank within (group, bucket) — ties share (rank(), exactly
    // the built-in's comparator); global rank = offset + fine rank
    val wFine = Window.partitionBy(col(partCol), col("__bucket"))
      .orderBy(col(scoreCol))
    (docs.withColumn("__bucket", bucketOf)
      .join(broadcast(offsets), Seq(partCol, "__bucket"))
      .withColumn("__rk", col("__off") + rank().over(wFine) - 1L)
      .withColumn(outCol,
        when(col("__tot") === 1L, 0L).otherwise(
          round(col("__rk").cast("double") / (col("__tot") - 1L).cast("double")
            * 1e6).cast("long")))
      .drop("__bucket", "__off", "__tot", "__rk"),
      release)
  }

  /** Global order-by + limit top-K (reference W2 "top movers",
    * `ingest_activity_and_report.sh:92-100`). Spark compiles this to
    * TakeOrderedAndProject — a true distributed top-K (per-partition
    * heap + driver merge), never a full global sort.
    */
  def topK(df: DataFrame, ordering: Seq[Column], k: Int): DataFrame =
    df.orderBy(ordering: _*).limit(k)
}
