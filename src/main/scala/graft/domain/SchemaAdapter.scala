package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mapping decision for one logical Top-100 field: which destination
  * column receives it, and whether that column is binary (the
  * reference's bytea detection).
  */
case class FieldMapping(field: String, destColumn: String, isBinary: Boolean)

/** The reference's destination-schema introspection adapter (M8,
  * `sql/top100_from_latest_bucket.sql:46-117`) re-expressed against
  * Spark's `StructType`: probe the destination's columns, pick each
  * logical field's column from the reference's candidate-name lists,
  * detect binary address columns, and build the adapted INSERT
  * projection — decoding `0x…` hex text to bytes exactly where (and
  * only where) the destination declares binary (P20,
  * `top100_from_latest_bucket.sql:106-117`:
  * `decode(substring(x from 3),'hex')::bytea`).
  *
  * Spark-first shape: the probe is `df.schema` (a `StructType` is the
  * engine's information_schema row set — no catalog round-trip), the
  * conditional decode is the built-in codegen'd `unhex`, and the
  * adapted projection is a plain `select`, so the whole adaptation
  * stays inside whole-stage codegen and adds zero exchanges to the
  * Top-100 plan it wraps.
  */
object SchemaAdapter {

  /** Candidate destination names per logical field, fields listed in
    * the reference's INSERT column order
    * (`top100_from_latest_bucket.sql:130-158`), candidates per field
    * in its probe order (`:49-75`). `required` mirrors the
    * reference's sanity gate (`:77-83`): bucket and inserted_at are
    * optional, the other six must map or the run aborts with the
    * field named.
    */
  final case class FieldSpec(field: String, candidates: Seq[String], required: Boolean)

  val fieldSpecs: Seq[FieldSpec] = Seq(
    FieldSpec("bucket", Seq("bucket_start_utc", "bucket_utc", "asof", "bucket_ts", "ts_bucket"), required = false),
    FieldSpec("contract", Seq("contract_address", "token", "token_address", "contract"), required = true),
    FieldSpec("rank", Seq("rnk", "rank", "position"), required = true),
    FieldSpec("holder", Seq("holder_address", "address", "wallet_address", "owner_address"), required = true),
    FieldSpec("decimals", Seq("token_decimal", "decimals", "token_decimals"), required = true),
    FieldSpec("balance_raw", Seq("balance_raw", "raw_balance", "quantity_raw", "qty_raw", "balance_base_units"), required = true),
    FieldSpec("balance", Seq("balance", "balance_ip", "balance_decimal", "qty"), required = true),
    FieldSpec("inserted_at", Seq("inserted_at", "updated_at", "created_at"), required = false))

  /** Resolve a destination schema to field mappings, in INSERT column
    * order. Throws `IllegalArgumentException("Could not map <field>
    * column")` — the reference's abort message — when a required
    * field has no candidate present.
    */
  def resolve(dest: StructType): Seq[FieldMapping] = {
    val byName = dest.fields.map(f => f.name -> f).toMap
    fieldSpecs.flatMap { spec =>
      spec.candidates.collectFirst {
        case c if byName.contains(c) =>
          FieldMapping(spec.field, c, byName(c).dataType == BinaryType)
      } match {
        case some @ Some(_) => some
        case None =>
          require(!spec.required, s"Could not map ${spec.field} column")
          None
      }
    }
  }

  /** `0x…` hex text → bytes: the reference's
    * `decode(substring(x from 3), 'hex')::bytea`. Codegen'd built-in;
    * malformed hex yields NULL (vs postgres decode's hard error),
    * which the caller's NOT NULL destination surfaces at write time.
    * Spark's `unhex` zero-pads ODD-length input (postgres errors) —
    * that lenience would silently nibble-shift a truncated address,
    * so odd lengths are forced to NULL here too.
    */
  def hexToBytes(c: Column): Column =
    when(length(c) % 2 === lit(1), lit(null).cast(BinaryType))
      .otherwise(unhex(c.substr(lit(3), length(c))))

  /** The adapted INSERT projection: rename each logical Top-100 column
    * ([[Top100.compute]] output shape) to its resolved destination
    * column, decode addresses to bytes where the destination is
    * binary, and cast the scalar fields to the destination's declared
    * types. Optional fields absent from the destination are simply
    * not projected (the reference's `has_bucket`/`has_inserted_at`
    * INSERT variants, `:130-158`).
    */
  def adaptedSelect(top100: DataFrame, dest: StructType): DataFrame = {
    val mappings = resolve(dest)
    val destByName = dest.fields.map(f => f.name -> f).toMap
    val cols = mappings.map { m =>
      val destType = destByName(m.destColumn).dataType
      val src: Column = m.field match {
        case "bucket"      => col("bucket_start_utc").cast(destType)
        case "contract"    => if (m.isBinary) hexToBytes(col("contract_address")) else col("contract_address")
        case "holder"      => if (m.isBinary) hexToBytes(col("holder_address")) else col("holder_address")
        case "rank"        => col("rnk").cast(destType)
        case "decimals"    => col("token_decimal").cast(destType)
        case "balance_raw" => col("balance_raw").cast(destType)
        case "balance"     => col("balance").cast(destType)
        case "inserted_at" => current_timestamp().cast(destType)
      }
      src.as(m.destColumn)
    }
    top100.select(cols: _*)
  }
}
