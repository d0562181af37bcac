package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-amount scaling and display formatting.
  *
  * Reference semantics: raw uint256 amounts are scaled to human units by
  * `raw / power(10, token_decimal)` (`sql/top100_compute.sql:16`) or by a
  * fixed 10^18 (`schema.sql:51-52` generated columns) — both conventions
  * preserved here. Display helpers mirror `scripts/lib_fmt.sh:10-58`
  * (2dp quantize, thousands separators, K/M/B/T humanize).
  *
  * Precision contract (SURVEY §7.4): raw on-chain amounts are carried as
  * lossless strings; arithmetic happens in Decimal(38,18), which covers
  * all real token amounts < 10^20 human units. Values overflowing 38
  * digits null out via try_cast — callers count/log them.
  */
object AmountFns {

  /** Exact decimal domain for amount arithmetic. */
  val AmountDec: DecimalType = DecimalType(38, 18)

  /** Raw integer amount (string or numeric) → human units, dividing by
    * 10^decimals (per-token convention, `top100_compute.sql:16`).
    * Stays in the decimal domain end-to-end: `pow` (double) is avoided
    * in favor of an exact decimal power-of-ten literal per row.
    *
    * Exact to 18 fractional digits; raw values ≥ 10^20 overflow
    * Decimal(38,18) and null out (try_cast — no ANSI runtime error).
    * For amounts where magnitude matters more than sub-micro
    * precision (ranking whale balances), use [[scaleByDecimalsWide]].
    */
  def scaleByDecimals(raw: Column, decimals: Column): Column =
    raw.try_cast(AmountDec) / power10(decimals)

  /** Wide-range variant: raw carried as Decimal(38,0) — any uint256
    * value up to 10^38−1 survives (covers every real token's total
    * supply) — and the division result is Decimal(38,6): exact
    * integer part up to 10^32, 6 fractional digits. This is the
    * ranking/display domain; [[scaleByDecimals]] is the exact-
    * arithmetic domain. Raw values needing >38 digits null out.
    */
  def scaleByDecimalsWide(raw: Column, decimals: Column): Column =
    raw.try_cast(DecimalType(38, 0)) / power10(decimals)

  /** Fixed-18 convention (`schema.sql:52,110` generated columns). */
  def scale18(raw: Column): Column =
    raw.try_cast(AmountDec) / lit(BigDecimal(10).pow(18))

  /** 10^d as exact Decimal. Double `pow` is exact for 10^d up to d=21
    * (mantissa 5^d fits in 53 bits), which covers every real token
    * decimal (max seen in the wild: 18); the cast back to Decimal(38,0)
    * is therefore lossless in that range.
    */
  private def power10(d: Column): Column =
    pow(lit(10.0), d.cast(IntegerType)).cast(DecimalType(38, 0))

  /** Banker-safe 2dp quantize (`lib_fmt.sh:10-20` `two_dec`). */
  def twoDec(x: Column): Column = x.cast(DecimalType(38, 2))

  /** Thousands-separated 2dp display (`lib_fmt.sh:22-39`). */
  def commify(x: Column): Column = format_number(x, 2)

  /** K/M/B/T humanized magnitude (`lib_fmt.sh:41-58`): divide by the
    * largest fitting power of 1000, 2dp, suffix. Pure when-chain —
    * codegen'd, no UDF.
    */
  def humanize(x: Column): Column = {
    val a = abs(x)
    def part(div: Double, suffix: String) =
      concat(format_number(x / div, 2), lit(suffix))
    when(a >= 1e12, part(1e12, "T"))
      .when(a >= 1e9, part(1e9, "B"))
      .when(a >= 1e6, part(1e6, "M"))
      .when(a >= 1e3, part(1e3, "K"))
      .otherwise(format_number(x, 2))
  }

  /** Shortened address display `0x1234…abcd` (`lib_fmt.sh:6`). */
  def shortAddr(addr: Column): Column =
    concat(substring(addr, 1, 6), lit("…"), substring(addr, -4, 4))
}
