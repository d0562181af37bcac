package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time bucketing / formatting expression helpers.
  *
  * Mirrors the reference's snapshot-bucket semantics
  * (`merlin_etl.py:190-194` `floor_to_6h`: floor hour to {0,6,12,18}
  * UTC, zero minutes/seconds) and its UTC display formatting
  * (`ingest_activity_and_report.sh:48` `to_char(... 'YYYY-MM-DD
  * HH24:MI"Z"')`). All helpers are built from codegen'd built-ins —
  * no UDFs — so they stay inside whole-stage codegen and push down.
  */
object TimeFns {

  /** Floor a timestamp to an arbitrary tumbling bucket, returned as
    * unix seconds (BIGINT). Epoch-aligned, UTC: bucket of width `w`
    * seconds containing `ts` starts at floor(epoch(ts)/w)*w.
    * Returning seconds (not a timestamp) keeps the output engine-
    * portable: identical in Spark and any SQL oracle, no tz ambiguity.
    */
  def bucketSeconds(ts: Column, widthSeconds: Long): Column =
    floor(unix_timestamp(ts.cast(org.apache.spark.sql.types.TimestampType)) / widthSeconds) * widthSeconds

  /** The reference's 6-hour snapshot bucket (21600 s), as unix seconds. */
  def bucket6h(ts: Column): Column = bucketSeconds(ts, 21600L)

  /** 6-hour bucket as a TIMESTAMP (UTC session tz). */
  def bucket6hTs(ts: Column): Column = timestamp_seconds(bucket6h(ts))

  /** Unix seconds → UTC timestamp (reference `ts_to_utc`,
    * `merlin_etl.py:180-182`).
    */
  def tsToUtc(unixSeconds: Column): Column = timestamp_seconds(unixSeconds)

  /** UTC display format `yyyy-MM-dd HH:mm'Z'` (reference `to_char`
    * pattern, `ingest_activity_and_report.sh:48`).
    */
  def formatUtcMinute(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm'Z'")
}
