package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-bucket operators: the reference's "latest 6-hour bucket"
  * pattern (`sql/top100_compute.sql:4-8`: join the fact table to
  * `SELECT max(bucket_start_utc)`).
  *
  * Spark shape: the scalar-max side is a 1-row aggregate — joining the
  * fact table to it broadcast-hash-joins for free (SURVEY §2.3 J1), so
  * the fact side is never shuffled. With the snapshot table partitioned
  * by bucket on disk, AQE + dynamic partition pruning turn this into a
  * scan of just the newest partition at cluster scale.
  */
object Snapshots {

  /** Keep only rows belonging to the max value of `bucketCol`.
    * Implemented as an inner equi-join against the broadcast 1-row
    * `max` aggregate — one pass, no driver round-trip, streaming-safe.
    */
  def latestBucket(df: DataFrame, bucketCol: Column): DataFrame = {
    val latest = df.agg(max(bucketCol).as("__latest_bucket"))
    df.join(broadcast(latest), bucketCol === col("__latest_bucket"))
      .drop("__latest_bucket")
  }
}
