package graft.domain

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reference's six domain tables
  * (`/root/reference/schema.sql:20-158`), mapped per SURVEY §1.2.
  *
  * Mapping decisions:
  *  - BIGSERIAL surrogate ids are dropped — the unique natural keys
  *    (recorded per table below) are the identity Spark works with.
  *  - `NUMERIC(78,0)` uint256 amounts are carried as lossless STRING
  *    (`*_raw`); arithmetic uses [[graft.functions.AmountFns]]
  *    (Decimal(38,18) exact path / Decimal(38,0)→(38,6) wide path).
  *  - `NUMERIC(78,18)` generated columns (`quantity_18d`, `value_18d`,
  *    schema.sql:51-52,109-110 — always /10^18) are computed in the
  *    write path, Spark having no generated columns on Parquet.
  *  - `JSONB` → JSON-carrying STRING + `get_json_object` access.
  *  - `TIMESTAMPTZ` → TimestampType under the UTC session zone.
  *  - Tables that scale (holders, transactions, top100) also carry a
  *    physical `bucket_unix` (BIGINT epoch-seconds of the 6h bucket)
  *    used as the on-disk partition column so latest-bucket queries
  *    prune to one directory; it is derived, never authored.
  */
object Schemas {

  /** Block-by-timestamp probe results (schema.sql:20-29).
    * Natural key: (unix_ts, closest) — schema.sql:29.
    */
  val blockCheck: StructType = StructType(Seq(
    StructField("unix_ts", LongType, nullable = false),
    StructField("ts_utc", TimestampType, nullable = false),
    StructField("closest", StringType, nullable = false), // 'before' | 'after'
    StructField("block_number", LongType, nullable = false),
    StructField("api_status", StringType),
    StructField("api_message", StringType),
    StructField("inserted_at", TimestampType)))

  /** Token-holder snapshots per 6h bucket (schema.sql:42-55).
    * Natural key: (bucket_start_utc, contract_address, holder_address)
    * — schema.sql:55. Addresses lowercased at ingest
    * (merlin_etl.py:297-298).
    */
  val holdersRaw: StructType = StructType(Seq(
    StructField("trigger_id", StringType, nullable = false),
    StructField("bucket_start_utc", TimestampType, nullable = false),
    StructField("contract_address", StringType, nullable = false),
    StructField("holder_address", StringType, nullable = false),
    StructField("token_decimal", IntegerType, nullable = false),
    StructField("quantity_raw", StringType, nullable = false),
    StructField("quantity_18d", DecimalType(38, 18)), // generated: raw / 10^18
    StructField("inserted_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("bucket_unix", LongType, nullable = false)))

  /** Refined Top-100 per (token, bucket) (schema.sql:71-82).
    * Natural key: (bucket_start_utc, contract_address, holder_address)
    * — schema.sql:80-81. `balance` is the per-token-decimal convention
    * (top100_compute.sql:16), carried as Decimal(38,6) (wide path).
    */
  val refinedWalletTop100: StructType = StructType(Seq(
    StructField("bucket_start_utc", TimestampType, nullable = false),
    StructField("contract_address", StringType, nullable = false),
    StructField("rnk", IntegerType, nullable = false),
    StructField("holder_address", StringType, nullable = false),
    StructField("token_decimal", IntegerType, nullable = false),
    StructField("balance_raw", StringType, nullable = false),
    StructField("balance", DecimalType(38, 6)),
    StructField("inserted_at", TimestampType),
    StructField("bucket_unix", LongType, nullable = false)))

  /** Per-wallet ERC-20 transfer log (schema.sql:94-124).
    * Dedup key: (tx_hash, contract_address, wallet_address, value_raw,
    * COALESCE(transaction_index, 0)) — schema.sql:123.
    */
  val walletTransactions: StructType = StructType(Seq(
    StructField("wallet_address", StringType, nullable = false),
    StructField("wallet_name", StringType),
    StructField("wallet_tag", StringType),
    StructField("contract_address", StringType, nullable = false),
    StructField("block_number", LongType, nullable = false),
    StructField("block_time_unix", LongType, nullable = false),
    StructField("block_time_utc", TimestampType, nullable = false),
    StructField("tx_hash", StringType, nullable = false),
    StructField("nonce", LongType),
    StructField("block_hash", StringType),
    StructField("from_address", StringType, nullable = false),
    StructField("to_address", StringType, nullable = false),
    StructField("value_raw", StringType, nullable = false),
    StructField("value_18d", DecimalType(38, 18)), // generated: raw / 10^18
    StructField("token_name", StringType),
    StructField("token_symbol", StringType),
    StructField("token_decimal", IntegerType),
    StructField("transaction_index", IntegerType),
    StructField("gas", LongType),
    StructField("gas_price", DecimalType(38, 0)),
    StructField("gas_used", LongType),
    StructField("cumulative_gas_used", LongType),
    StructField("input", StringType),
    StructField("confirmations", LongType),
    StructField("ingested_at", TimestampType)))

  /** Incremental-ingest resume state (schema.sql:135-141).
    * Natural key: stream. Merge semantics: GREATEST on block/page,
    * metadata replaced (merlin_etl.py:159-175).
    */
  val ingestionCursors: StructType = StructType(Seq(
    StructField("stream", StringType, nullable = false),
    StructField("last_scanned_block", LongType),
    StructField("last_page", IntegerType),
    StructField("updated_at_utc", TimestampType, nullable = false),
    StructField("metadata", StringType))) // JSON

  /** ETL job audit (schema.sql:147-156). Surrogate id replaced by a
    * driver-generated UUID (SURVEY S8).
    */
  val jobRuns: StructType = StructType(Seq(
    StructField("job_id", StringType, nullable = false),
    StructField("job_name", StringType, nullable = false),
    StructField("scheduled_for", TimestampType, nullable = false),
    StructField("started_at", TimestampType),
    StructField("finished_at", TimestampType),
    StructField("status", StringType, nullable = false), // success|error|partial|running
    StructField("stats", StringType), // JSON
    StructField("error", StringType)))
}
