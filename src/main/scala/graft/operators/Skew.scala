package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles on hot keys.
  *
  * First line of defense is AQE (on by default in this engine's
  * sessions): it splits oversized sort-merge-join partitions at
  * runtime. Salting remains the tool when AQE can't help — broadcast
  * is impossible (both sides large), the skew is in an AGGREGATION
  * rather than a join, or the hot key's rows exceed what a single
  * split can hold.
  *
  * The salt never changes results: it only spreads one key's rows
  * across `saltFactor` reducers.
  */
object Skew {

  /** Equi-join with the left (big, skewed) side salted: each left row
    * gets a salt from a cheap row-local hash; the right side is
    * replicated `saltFactor`× (explode of a literal range — its
    * shuffle volume multiplies, so keep the smaller side right). Join
    * keys become (keys..., salt), so one hot key fans out to
    * `saltFactor` reducers. Result is row-for-row the plain inner
    * join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    // any per-row value works as salt (it cannot affect the result);
    // hashing all columns avoids nondeterministic functions so the
    // plan stays re-executable (stage retries see stable salts)
    val l = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val r = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys with non-algebraic
    * per-group state (e.g. distinct counting, where a hot key's hash
    * set would live in one task): phase 1 aggregates per (key, salt),
    * phase 2 merges the partials per key. For plain algebraic
    * aggregates (sum/count/min/max) Spark's map-side partials already
    * do this — use it only when the partial state is the problem.
    *
    * `partial` builds phase-1 aggregate columns; `merge` combines
    * them per key.
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltCol: Column,
                  partial: Seq[Column], merge: Seq[Column],
                  saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltCol, lit(saltFactor)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skewed exact distinct count per key: phase 1 counts distinct
    * values within (key, salt-of-value) — each hot key's value set is
    * split across `saltFactor` partial states; because the salt is a
    * function of the VALUE, the per-salt distinct sets are disjoint
    * and phase 2 can simply sum them.
    */
  def distinctCountSkewed(df: DataFrame, keys: Seq[String], valueCol: Column,
                          resultName: String, saltFactor: Int = 16): DataFrame =
    twoPhaseAgg(df, keys, xxhash64(valueCol),
      partial = Seq(countDistinct(valueCol).as("__pd")),
      merge = Seq(sum(col("__pd")).cast("long").as(resultName)),
      saltFactor = saltFactor)
}
