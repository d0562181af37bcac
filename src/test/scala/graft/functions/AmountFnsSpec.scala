package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Decimal-scaling contract (SURVEY §7.4 #1) and the display-format
  * goldens mirroring the reference's `scripts/lib_fmt.sh:6-58`.
  */
class AmountFnsSpec extends SparkSpec {

  private def scaled(raw: String, dec: Int): Option[BigDecimal] = {
    val ss = spark; import ss.implicits._
    Option(Seq((raw, dec)).toDF("raw", "d")
      .select(AmountFns.scaleByDecimals(col("raw"), col("d")))
      .collect().head.getDecimal(0)).map(BigDecimal(_))
  }

  test("scaleByDecimals for decimals in {0, 6, 8, 18}") {
    assert(scaled("42", 0).get == BigDecimal(42))
    assert(scaled("1234567", 6).get == BigDecimal("1.234567"))
    assert(scaled("250000000", 8).get == BigDecimal("2.5"))
    assert(scaled("1000000000000000000", 18).get == BigDecimal(1))
    assert(scaled("1", 18).get == BigDecimal("0.000000000000000001"))
  }

  test("scaleByDecimals nulls out raw values beyond Decimal(38,18) range") {
    assert(scaled("1" + "0" * 39, 18).isEmpty) // 10^39
    assert(scaled("1" + "0" * 20, 18).isEmpty) // 10^20 ≥ 20 int digits
  }

  test("scaleByDecimalsWide covers whale balances up to 10^38 raw") {
    val ss = spark; import ss.implicits._
    def wide(raw: String, dec: Int): Option[BigDecimal] =
      Option(Seq((raw, dec)).toDF("raw", "d")
        .select(AmountFns.scaleByDecimalsWide(col("raw"), col("d")))
        .collect().head.getDecimal(0)).map(BigDecimal(_))
    // 10^27 raw at 18 decimals = 10^9 human units (a 1B-token supply)
    assert(wide("1" + "0" * 27, 18).get == BigDecimal(1000000000))
    assert(wide("123456789012345678901", 18).get == BigDecimal("123.456789"))
    assert(wide("1" + "0" * 39, 18).isEmpty) // > 38 digits: null contract
  }

  test("scale18 fixed-convention matches schema.sql generated columns") {
    val ss = spark; import ss.implicits._
    val got = Seq("1500000000000000000").toDF("raw")
      .select(AmountFns.scale18(col("raw"))).collect().head.getDecimal(0)
    assert(BigDecimal(got) == BigDecimal("1.5"))
  }

  test("twoDec quantizes to 2dp") {
    val ss = spark; import ss.implicits._
    val got = Seq(1234.567).toDF("x")
      .select(AmountFns.twoDec(col("x")).cast("string")).as[String].head()
    assert(got == "1234.57")
  }

  test("commify golden (lib_fmt.sh commify_decimal)") {
    val ss = spark; import ss.implicits._
    val got = Seq(1234567.891).toDF("x")
      .select(AmountFns.commify(col("x"))).as[String].head()
    assert(got == "1,234,567.89")
  }

  test("humanize goldens (lib_fmt.sh humanize_decimal K/M/B/T)") {
    val ss = spark; import ss.implicits._
    val got = Seq(999.0, 1234.0, 1500000.0, 2500000000.0, 2.5e12, -1234.0)
      .toDF("x").select(AmountFns.humanize(col("x"))).as[String].collect().toSeq
    assert(got == Seq("999.00", "1.23K", "1.50M", "2.50B", "2.50T", "-1.23K"))
  }

  test("shortAddr golden (lib_fmt.sh short display)") {
    val ss = spark; import ss.implicits._
    val got = Seq("0x1234567890abcdef1234567890abcdef12345678").toDF("a")
      .select(AmountFns.shortAddr(col("a"))).as[String].head()
    assert(got == "0x1234…5678")
  }
}
