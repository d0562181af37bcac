package graft.domain

import java.sql.Timestamp

/** Case classes for the typed `Dataset[T]` surface over the domain
  * tables (SURVEY §1.2: worth defining for the core tables for test
  * ergonomics and compile-time field checks). Field names/order track
  * [[Schemas]] — `ModelsSpec` asserts the encoders stay aligned so
  * drift between the typed and untyped surfaces fails loudly.
  *
  * Nullable columns are `Option`; uint256 amounts stay `String`
  * (lossless raw) exactly as in the untyped schema.
  */
object Models {

  final case class BlockCheck(
      unix_ts: Long, ts_utc: Timestamp, closest: String, block_number: Long,
      api_status: Option[String], api_message: Option[String],
      inserted_at: Option[Timestamp])

  final case class HolderRaw(
      trigger_id: String, bucket_start_utc: Timestamp, contract_address: String,
      holder_address: String, token_decimal: Int, quantity_raw: String,
      quantity_18d: Option[BigDecimal], inserted_at: Option[Timestamp],
      updated_at: Option[Timestamp], bucket_unix: Long)

  final case class Top100Row(
      bucket_start_utc: Timestamp, contract_address: String, rnk: Int,
      holder_address: String, token_decimal: Int, balance_raw: String,
      balance: Option[BigDecimal], inserted_at: Option[Timestamp],
      bucket_unix: Long)

  final case class WalletTransaction(
      wallet_address: String, wallet_name: Option[String], wallet_tag: Option[String],
      contract_address: String, block_number: Long, block_time_unix: Long,
      block_time_utc: Timestamp, tx_hash: String, nonce: Option[Long],
      block_hash: Option[String], from_address: String, to_address: String,
      value_raw: String, value_18d: Option[BigDecimal], token_name: Option[String],
      token_symbol: Option[String], token_decimal: Option[Int],
      transaction_index: Option[Int], gas: Option[Long],
      gas_price: Option[BigDecimal], gas_used: Option[Long],
      cumulative_gas_used: Option[Long], input: Option[String],
      confirmations: Option[Long], ingested_at: Option[Timestamp])

  final case class IngestionCursor(
      stream: String, last_scanned_block: Option[Long], last_page: Option[Int],
      updated_at_utc: Timestamp, metadata: Option[String])

  final case class JobRun(
      job_id: String, job_name: String, scheduled_for: Timestamp,
      started_at: Option[Timestamp], finished_at: Option[Timestamp],
      status: String, stats: Option[String], error: Option[String])
}
