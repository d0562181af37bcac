package graft.domain

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M8/P20 adapter unit contract: candidate-name precedence, the
  * reference's abort message on unmappable required fields, bytea
  * detection per address column, and byte-exact conditional decode
  * (`top100_from_latest_bucket.sql:46-117`).
  */
class SchemaAdapterSpec extends SparkSpec {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private val fullText = st(
    "bucket_start_utc" -> TimestampType, "contract_address" -> StringType,
    "rnk" -> IntegerType, "holder_address" -> StringType,
    "token_decimal" -> ShortType, "balance_raw" -> StringType,
    "balance" -> DoubleType, "inserted_at" -> TimestampType)

  test("resolve picks the FIRST present candidate per field (reference probe order)") {
    // Destination carries BOTH 'rnk' and 'rank', BOTH 'holder_address'
    // and 'address' — the earlier candidate must win, as the
    // reference's `LIMIT 1` over the ordered IN-list does.
    val both = st(
      "contract" -> StringType, "rank" -> LongType, "rnk" -> IntegerType,
      "address" -> BinaryType, "holder_address" -> StringType,
      "token_decimal" -> IntegerType, "balance_raw" -> StringType,
      "balance" -> DoubleType)
    val m = SchemaAdapter.resolve(both).map(fm => fm.field -> fm.destColumn).toMap
    assert(m("rank") == "rnk")
    assert(m("holder") == "holder_address")
    assert(m("contract") == "contract")
  }

  test("optional fields are skipped when absent; required fields abort with the field named") {
    val noOptionals = st(
      "contract_address" -> StringType, "rnk" -> IntegerType,
      "holder_address" -> StringType, "token_decimal" -> IntegerType,
      "balance_raw" -> StringType, "balance" -> DoubleType)
    val fields = SchemaAdapter.resolve(noOptionals).map(_.field)
    assert(fields == Seq("contract", "rank", "holder", "decimals", "balance_raw", "balance"))

    val missingRank = st(
      "contract_address" -> StringType, "holder_address" -> StringType,
      "token_decimal" -> IntegerType, "balance_raw" -> StringType,
      "balance" -> DoubleType)
    val e = intercept[IllegalArgumentException](SchemaAdapter.resolve(missingRank))
    assert(e.getMessage.contains("Could not map rank column"))
  }

  test("bytea detection is independent per address column") {
    val mixed = st(
      "contract" -> StringType, "address" -> BinaryType, "rank" -> LongType,
      "decimals" -> IntegerType, "balance_base_units" -> StringType,
      "balance_decimal" -> DoubleType)
    val m = SchemaAdapter.resolve(mixed).map(fm => fm.field -> fm.isBinary).toMap
    assert(!m("contract") && m("holder"))
  }

  test("adaptedSelect decodes 0x-hex to exact bytes only for binary destinations") {
    import spark.implicits._
    val top = Seq(
      ("0x00ff10", "0xDEADbeef", 1, 6, "1000000", 1.0))
      .toDF("contract_address", "holder_address", "rnk", "token_decimal",
        "balance_raw", "balance")
      .withColumn("bucket_start_utc", timestamp_seconds(lit(21600L)))
      .withColumn("bucket_unix", lit(21600L))
    val dest = st(
      "asof" -> TimestampType, "token" -> BinaryType, "position" -> LongType,
      "owner_address" -> StringType, "token_decimals" -> IntegerType,
      "qty_raw" -> StringType, "qty" -> DoubleType)
    val out = SchemaAdapter.adaptedSelect(top, dest)
    // INSERT column order + destination names + declared types
    assert(out.columns.toSeq ==
      Seq("asof", "token", "position", "owner_address", "token_decimals", "qty_raw", "qty"))
    assert(out.schema("token").dataType == BinaryType)
    assert(out.schema("owner_address").dataType == StringType)
    assert(out.schema("position").dataType == LongType)
    val r: Row = out.collect().head
    // binary contract: decode(substring(x from 3),'hex') — byte-exact,
    // case-insensitive hex as in postgres decode()
    assert(r.getAs[Array[Byte]]("token").toSeq == Seq(0x00, 0xff, 0x10).map(_.toByte))
    // text holder: passed through UNdecoded (the conditional's else arm)
    assert(r.getAs[String]("owner_address") == "0xDEADbeef")
    assert(r.getAs[Long]("position") == 1L)
  }

  test("malformed hex decodes to NULL, never to wrong bytes") {
    import spark.implicits._
    val top = Seq(("0xzz", "0xabc", 1, 0, "1", 1.0))
      .toDF("contract_address", "holder_address", "rnk", "token_decimal",
        "balance_raw", "balance")
      .withColumn("bucket_start_utc", timestamp_seconds(lit(0L)))
    val dest = st(
      "token" -> BinaryType, "owner_address" -> BinaryType, "position" -> LongType,
      "token_decimals" -> IntegerType, "qty_raw" -> StringType, "qty" -> DoubleType)
    val r = SchemaAdapter.adaptedSelect(top, dest).collect().head
    assert(r.isNullAt(r.fieldIndex("token")))     // 'zz' is not hex
    assert(r.isNullAt(r.fieldIndex("owner_address"))) // odd length
  }
}
