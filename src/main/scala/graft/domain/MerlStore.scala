package graft.domain

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table store implementing the reference's write-side
  * operators (SURVEY §2.8) on Spark's immutable-write model:
  *
  *  - M1/M3/M4 — update-on-conflict and refresh upserts become
  *    DYNAMIC PARTITION OVERWRITE: snapshot jobs always rewrite whole
  *    (token, bucket) partitions (`run_holders_and_top100.sh:41`
  *    "idempotent within bucket"), so replacing the partition IS the
  *    upsert, with no row-level merge needed. At 100 TB this writes
  *    only the touched partitions and never rewrites history.
  *  - M2 — insert-ignore (`ON CONFLICT DO NOTHING`,
  *    merlin_etl.py:441-447) becomes left-anti-join append on the
  *    natural key, including the reference's
  *    `COALESCE(transaction_index, 0)` key component (schema.sql:123).
  *  - M5 — cursor GREATEST-merge (merlin_etl.py:159-175) as a
  *    full-outer merge rewrite of the (tiny) cursors table.
  *  - M6 — job audit bracket (merlin_etl.py:133-151) as append +
  *    keyed rewrite of the (tiny) job_runs table.
  *
  * Small bookkeeping tables (cursors, job_runs, block_check) use
  * [[rewrite]]: materialize the merged frame into a staging directory,
  * then atomically swap — never overwrite a path being lazily read.
  * Big tables never take this path.
  */
class MerlStore(spark: SparkSession, root: String) {

  import MerlStore._

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = {
    val p = new Path(path(table))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  private def readOrEmpty(table: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(table)) read(table)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Staging-then-swap rewrite for SMALL bookkeeping tables. The
    * staging write fully materializes `df` (which may lazily read the
    * current table) before the old directory is dropped.
    */
  private def rewrite(table: String, df: DataFrame): Unit = {
    val p = new Path(path(table))
    val staging = new Path(path(table) + ".staging")
    // Bookkeeping tables are tiny by contract (one row per stream /
    // job / probe): one output file, not one per shuffle partition —
    // the next read is then a single-split scan instead of a
    // small-files listing.
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(staging, p)
  }

  // ---- M1 / M3 / M4: partition-overwrite upserts --------------------

  /** Holders snapshot upsert (M1, merlin_etl.py:304-318): within-batch
    * last-wins dedup on the natural key, then dynamic overwrite of the
    * touched (contract_address, bucket_unix) partitions. Re-running a
    * bucket refreshes it; other partitions untouched.
    */
  def upsertHolders(batch: DataFrame): Unit = {
    val partCols = Seq("contract_address", "bucket_unix")
    // ONE shuffle, not two: cluster on the write-partition key first;
    // the full-key dedup then needs no second exchange, because hash
    // partitioning on a SUBSET of the dedup key already co-locates
    // equal keys (Catalyst recognizes this and plans a single
    // aggregate over the existing distribution).
    val clustered = batch.repartition(partCols.map(col): _*)
      .dropDuplicates(HoldersKey)
    writePartitioned("holders_raw", withAudit(clustered), partCols)
  }

  /** Top-100 refresh (M3/M4, top100_compute.sql:30-35 and the
    * delete-then-insert variant top100_from_latest_bucket.sql:119-158):
    * the job recomputes the full Top-100 per (token, bucket), so
    * partition overwrite ≡ upsert ≡ delete+insert.
    */
  def refreshTop100(top100: DataFrame): Unit =
    overwritePartitions("refined_wallet_top100", top100,
      Seq("contract_address", "bucket_unix"))

  /** Dynamic partition overwrite, with rows hash-clustered on the
    * partition key first so each partition directory gets ~one file
    * per batch instead of one per shuffle task (the small-files
    * problem). Trade-off: a single hot (token, bucket) writes from
    * one task — if a snapshot ever outgrows that, salt the
    * repartition with a bounded file index.
    */
  private def overwritePartitions(table: String, df: DataFrame, partCols: Seq[String]): Unit =
    writePartitioned(table, df.repartition(partCols.map(col): _*), partCols)

  /** Dynamic-overwrite write of an ALREADY partition-clustered frame —
    * callers that produced the clustering upstream (e.g. a dedup over
    * a superset key) skip the extra exchange.
    */
  private def writePartitioned(table: String, df: DataFrame, partCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .parquet(path(table))

  // ---- M2: insert-ignore append ------------------------------------

  /** Wallet-transaction append with insert-ignore dedup (M2): the key
    * is (tx_hash, contract_address, wallet_address, value_raw,
    * COALESCE(transaction_index,0)) per schema.sql:123 — null and 0
    * transaction_index collapse to the same identity. Within-batch
    * dedup keeps one row per key; cross-batch dedup is a left-anti
    * join against the existing keys. At scale the anti-join shuffles
    * only the key columns of the existing side; the existing-side scan
    * is pruned to the batch's OWN distinct `contract_address` values
    * (one partition-pruning directory filter per touched token), so
    * dedup cost follows the touched tokens' history, not the whole
    * table. The prune set is derived from the batch — never trusted
    * from the caller — because a caller-supplied list that missed a
    * token would silently bypass insert-ignore dedup for that token's
    * rows and duplicate them on replay. `contracts`, when given, is a
    * declared confinement that is VALIDATED against the batch (the
    * reference ingests per (wallet, token), merlin_etl.py:346).
    */
  def appendWalletTransactions(batch: DataFrame, contracts: Option[Seq[String]] = None): Unit = {
    val keyed = batch.withColumn("__ti0", coalesce(col("transaction_index"), lit(0)))
      .dropDuplicates(TxKey)
    val fresh =
      if (!exists("wallet_transactions")) keyed
      else {
        // Tiny driver-side distinct: the batch is one bounded flush
        // window (≤ ~100k buffered rows), and its token set is ~1.
        val batchContracts = keyed.select("contract_address").distinct()
          .collect().flatMap(r => Option(r.getString(0))).toSeq
        contracts.foreach { cs =>
          val declared = cs.map(_.toLowerCase).toSet
          val stray = batchContracts.filterNot(c => declared.contains(c.toLowerCase))
          require(stray.isEmpty,
            s"appendWalletTransactions: batch contains contract_address values outside " +
              s"the declared contracts list: ${stray.mkString(", ")}")
        }
        val base = read("wallet_transactions")
        val pruned =
          if (batchContracts.isEmpty) base
          else base.filter(col("contract_address").isin(batchContracts: _*))
        val existing = pruned
          .withColumn("__ti0", coalesce(col("transaction_index"), lit(0)))
          .select(TxKey.map(col): _*)
        keyed.join(existing, TxKey, "left_anti")
      }
    fresh.drop("__ti0")
      .repartition(col("contract_address"))
      .write.mode(SaveMode.Append)
      .partitionBy("contract_address")
      .parquet(path("wallet_transactions"))
  }

  // ---- block_check: small-table update-on-conflict ------------------

  /** Block-probe upsert on (unix_ts, closest) (schema.sql:29): new
    * rows win over conflicting old rows; table is small (one row per
    * probe hour).
    */
  def upsertBlockCheck(batch: DataFrame): Unit = {
    val deduped = batch.dropDuplicates(Seq("unix_ts", "closest"))
    val existing = readOrEmpty("block_check", Schemas.blockCheck)
    val kept = existing.join(deduped.select("unix_ts", "closest"),
      Seq("unix_ts", "closest"), "left_anti")
    rewrite("block_check", kept.unionByName(deduped, allowMissingColumns = true))
  }

  // ---- M5: cursor GREATEST-merge ------------------------------------

  /** Bulk cursor merge (M5, merlin_etl.py:159-175): per stream,
    * last_scanned_block and last_page move monotonically forward
    * (GREATEST of old and new, nulls as 0), metadata is replaced by
    * the incoming value, updated_at_utc refreshed. Accepts a frame of
    * (stream, last_scanned_block, last_page, metadata) rows so a whole
    * ingest batch checkpoints in one write.
    */
  def mergeCursors(incoming: DataFrame): Unit = {
    val existing = readOrEmpty("ingestion_cursors", Schemas.ingestionCursors)
    val o = existing.select(col("stream"),
      col("last_scanned_block").as("__ob"), col("last_page").as("__op"),
      col("metadata").as("__om"))
    val n = incoming.select(col("stream"),
      col("last_scanned_block").as("__nb"), col("last_page").as("__np"),
      col("metadata").as("__nm"))
    val merged = o.join(n, Seq("stream"), "full_outer").select(
      col("stream"),
      greatest(coalesce(col("__ob"), lit(0L)), coalesce(col("__nb"), lit(0L)))
        .as("last_scanned_block"),
      greatest(coalesce(col("__op"), lit(0)), coalesce(col("__np"), lit(0)))
        .as("last_page"),
      current_timestamp().as("updated_at_utc"),
      coalesce(col("__nm"), col("__om"), lit("{}")).as("metadata"))
    rewrite("ingestion_cursors", merged)
  }

  /** Single-stream convenience mirroring the reference's per-call API. */
  def cursorUpsert(stream: String, lastBlock: Option[Long],
                   lastPage: Option[Int], metadata: String = "{}"): Unit = {
    import spark.implicits._
    mergeCursors(Seq((stream, lastBlock, lastPage, metadata))
      .toDF("stream", "last_scanned_block", "last_page", "metadata"))
  }

  /** Saved cursor for a stream key, if any (merlin_etl.py:154-156). */
  def cursorGet(stream: String): Option[(Long, Int)] =
    if (!exists("ingestion_cursors")) None
    else read("ingestion_cursors").filter(col("stream") === stream)
      .select(coalesce(col("last_scanned_block"), lit(0L)),
        coalesce(col("last_page"), lit(0)))
      .collect().headOption.map(r => (r.getLong(0), r.getInt(1)))

  // ---- M6: job audit bracket ----------------------------------------

  /** Open a job_runs row (S8/M6, merlin_etl.py:133-141); returns the
    * generated job id (UUID — the driver-side identity replacing
    * BIGSERIAL + RETURNING).
    */
  def jobStart(jobName: String): String = {
    import spark.implicits._
    val id = java.util.UUID.randomUUID().toString
    val row = Seq((id, jobName)).toDF("job_id", "job_name")
      .withColumn("scheduled_for", current_timestamp())
      .withColumn("started_at", current_timestamp())
      .withColumn("finished_at", lit(null).cast("timestamp"))
      .withColumn("status", lit("running"))
      .withColumn("stats", lit("{}"))
      .withColumn("error", lit(null).cast("string"))
    row.write.mode(SaveMode.Append).parquet(path("job_runs"))
    id
  }

  /** Close a job_runs row (merlin_etl.py:144-151): set finished_at,
    * status, stats (replacing when provided), error (kept when not).
    */
  def jobFinish(jobId: String, status: String,
                stats: Option[String] = None, error: Option[String] = None): Unit = {
    val updated = read("job_runs").withColumns(Map(
      "finished_at" -> when(col("job_id") === jobId, current_timestamp())
        .otherwise(col("finished_at")),
      "status" -> when(col("job_id") === jobId, lit(status)).otherwise(col("status")),
      "stats" -> when(col("job_id") === jobId, coalesce(lit(stats.orNull), col("stats")))
        .otherwise(col("stats")),
      "error" -> when(col("job_id") === jobId, coalesce(lit(error.orNull), col("error")))
        .otherwise(col("error"))))
    rewrite("job_runs", updated)
  }

  /** Drop every table under this store root (test/fixture hygiene). */
  def destroy(): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}

object MerlStore {
  /** Natural key of holders_raw (schema.sql:55). */
  val HoldersKey: Seq[String] = Seq("bucket_start_utc", "contract_address", "holder_address")

  /** Dedup key of wallet_transactions (schema.sql:123) with the
    * COALESCE'd transaction_index materialized as __ti0.
    */
  val TxKey: Seq[String] =
    Seq("tx_hash", "contract_address", "wallet_address", "value_raw", "__ti0")

  /** Audit columns on write (schema.sql:9-14 trigger + defaults). */
  def withAudit(df: DataFrame): DataFrame =
    df.withColumn("inserted_at", current_timestamp())
      .withColumn("updated_at", current_timestamp())
}
