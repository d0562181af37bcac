package graft.functions

import graft.SparkSpec
import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.functions._

/** 6h bucket edges per reference `floor_to_6h` (merlin_etl.py:190-194):
  * hours {0,5} → 00:00, {6} → 06:00, {23} → 18:00, minutes/seconds
  * zeroed, all UTC.
  */
class TimeFnsSpec extends SparkSpec {

  private def utc(h: Int, m: Int = 0): Timestamp =
    Timestamp.from(LocalDateTime.of(2024, 1, 15, h, m, 42).toInstant(ZoneOffset.UTC))

  private def epochUtc(h: Int): Long =
    LocalDateTime.of(2024, 1, 15, h, 0, 0).toInstant(ZoneOffset.UTC).getEpochSecond

  test("bucket6h floors edge hours 0/5/6/23 to {0,0,6,18}") {
    val ss = spark; import ss.implicits._
    val got = Seq(utc(0), utc(5, 59), utc(6), utc(23, 59)).toDF("ts")
      .select(TimeFns.bucket6h(col("ts"))).as[Long].collect().toSeq
    assert(got == Seq(epochUtc(0), epochUtc(0), epochUtc(6), epochUtc(18)))
  }

  test("bucket6hTs returns the bucket start as a UTC timestamp") {
    val ss = spark; import ss.implicits._
    val got = Seq(utc(13, 30)).toDF("ts")
      .select(TimeFns.bucket6hTs(col("ts")).cast("string")).as[String].head()
    assert(got == "2024-01-15 12:00:00")
  }

  test("bucketSeconds is epoch-aligned for arbitrary widths") {
    val ss = spark; import ss.implicits._
    val got = Seq(utc(7, 29)).toDF("ts")
      .select(TimeFns.bucketSeconds(col("ts"), 3600L)).as[Long].head()
    assert(got == epochUtc(7))
  }

  test("tsToUtc converts unix seconds") {
    val ss = spark; import ss.implicits._
    val got = Seq(epochUtc(6)).toDF("s")
      .select(TimeFns.tsToUtc(col("s")).cast("string")).as[String].head()
    assert(got == "2024-01-15 06:00:00")
  }

  test("formatUtcMinute renders the reference to_char pattern") {
    val ss = spark; import ss.implicits._
    val got = Seq(utc(6, 7)).toDF("ts")
      .select(TimeFns.formatUtcMinute(col("ts"))).as[String].head()
    assert(got == "2024-01-15 06:07Z")
  }
}
