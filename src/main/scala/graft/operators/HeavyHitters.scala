package graft.operators

import graft.plans.GraftExtensions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact top-K frequent items without a full-cardinality shuffle —
  * the 100 TB answer to "top 50 tokens over a billion-word
  * vocabulary", built on the [[graft.plans.MisraGriesSketch]]
  * candidate generator.
  *
  * The plain `groupBy(item).count().orderBy(desc).limit(k)` is exact
  * but its exchange carries one row per DISTINCT item (the whole
  * vocabulary). Here:
  *
  *  1. ONE scan reduces each partition to ≤ `capacity` (item, weight)
  *     pairs (MG partials, map-side), merged into one summary — a
  *     driver-side frame of at most `capacity` rows, shuffle volume
  *     O(capacity · partitions) regardless of vocabulary size.
  *  2. A second scan recounts ONLY the candidates exactly: broadcast
  *     hash semi-join (no shuffle of the corpus), map-side-combined
  *     counts of ≤ `capacity` groups.
  *  3. The MG bound certifies exactness: every item with true
  *     frequency > N/capacity is a candidate, so if the k-th confirmed
  *     count clears that bar, the true top-K is a subset of the
  *     candidates and the recount makes it exact. The composition
  *     REFUSES (IllegalStateException, with the capacity to retry at)
  *     rather than silently returning approximate ranks when the
  *     distribution is too flat for the bound — same contract shape as
  *     [[Decontam]]'s Bloom stage: the sketch moves cost, never the
  *     answer.
  */
object HeavyHitters {

  /** Exact (item, n) top-K by frequency, ties broken by item asc.
    * Output columns: `item` (string), `n` (long), ordered by
    * (n desc, item asc), exactly `k` rows (fewer if < k distinct).
    */
  def exactTopK(items: DataFrame, itemCol: Column, k: Int,
                capacity: Int = 4096): DataFrame = {
    val spark = items.sparkSession
    GraftExtensions.ensureRegistered(spark)
    import spark.implicits._
    val it = items.select(itemCol.cast("string").as("item"))

    // pass 1: N and the merged MG summary in one scan
    val row = it.agg(
      count(lit(1)).as("n"),
      call_function("graft_mg", col("item"), lit(capacity)).as("mg")).head()
    val n = row.getLong(0)
    val cands = row.getMap[String, Long](1).keys.toSeq

    // pass 2: exact recount of ALL candidates (≤ capacity groups,
    // broadcast semi-join — tiny, collected for certification anyway)
    val confirmed = it
      .join(broadcast(cands.toDF("item")), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item").asc)
      .collect()

    // certify exactness, two sufficient conditions:
    //  (a) full coverage: confirmed counts sum to N ⇒ the candidates
    //      ARE the whole item population (distinct ≤ capacity) — any
    //      k is exact;
    //  (b) bound clearance: the k-th confirmed count exceeds N/m, the
    //      MG survival threshold ⇒ every true top-k item is a
    //      candidate. Anything else (including < k surviving
    //      candidates over a flatter-than-N/m distribution) REFUSES.
    val covered = confirmed.iterator.map(_.getLong(1)).sum == n
    val certified = covered || (confirmed.length >= k &&
      confirmed(k - 1).getLong(1) * capacity.toLong > n)
    if (!certified) {
      val kth = if (confirmed.length >= k) confirmed(k - 1).getLong(1) else 0L
      throw new IllegalStateException(
        s"MG capacity $capacity cannot certify exact top-$k: k-th count " +
          s"$kth ≤ N/m = $n/$capacity. Retry with capacity > " +
          s"${if (kth > 0) n / kth else n}.")
    }
    confirmed.take(k).map(r => (r.getString(0), r.getLong(1))).toSeq
      .toDF("item", "n")
      .orderBy(col("n").desc, col("item").asc)
  }
}
