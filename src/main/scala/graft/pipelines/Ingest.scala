package graft.pipelines

import graft.domain.MerlStore
import graft.functions.AmountFns
import graft.sources.{Envelope, ExplorerClient, HadoopTransport}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** The reference's three ingest pipelines (E1/E2,
  * `merlin_etl.py:199-479`) on the Spark store: page loop driver-side
  * (the API is the bottleneck at 3 QPS, not Spark), transform and
  * write as DataFrames, cursor/audit bookkeeping through
  * [[MerlStore]].
  *
  * Faithful semantics ported from the reference:
  *  - field-name coalescing across explorer variants
  *    (`merlin_etl.py:276-284`), null-row drops, sticky decimals
  *    detection, lowercase address normalization;
  *  - termination on `status != "1"` / empty / short page;
  *  - tokentx cursor resume: effective startblock = max(saved,
  *    provided) (`merlin_etl.py:353-357`), running `last_block` max,
  *    cursor checkpoint after every page;
  *  - job audit bracket: success with stats / error recorded, data
  *    write only on success (`merlin_etl.py:218-235`).
  */
object Ingest {

  /** Cursor-metadata JSON for a probe envelope. Status/message are
    * free text from the explorer — escape them (quotes, backslashes,
    * control chars) so the stored metadata is always valid JSON; one
    * shared helper for the sequential loop AND the parallel replay,
    * so the two paths cannot drift.
    */
  private[pipelines] def probeMetaJson(status: String, message: String): String = {
    def esc(v: String): String = {
      val sb = new StringBuilder
      v.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    s"""{"status":"${esc(status)}","message":"${esc(message)}"}"""
  }

  /** `parse_int` (`merlin_etl.py:184-188`): null on failure. */
  def parseLong(s: String): Option[Long] =
    Option(s).flatMap(v => scala.util.Try(v.trim.toLong).toOption)
  def parseInt(s: String): Option[Int] =
    Option(s).flatMap(v => scala.util.Try(v.trim.toInt).toOption)

  private def jl(v: Option[Long]): Any = v.map(java.lang.Long.valueOf).orNull
  private def ji(v: Option[Int]): Any = v.map(java.lang.Integer.valueOf).orNull

  final case class BlockByTimeResult(blockNumber: Option[Long], status: String, message: String)

  /** E1a (`merlin_etl.py:199-236`): probe block number for a unix
    * timestamp, upsert into block_check on (unix_ts, closest).
    */
  def blockByTime(spark: SparkSession, store: MerlStore, client: ExplorerClient,
                  unixTs: Long, closest: String = "after"): BlockByTimeResult = {
    val jobId = store.jobStart("block_check_hourly")
    try {
      val env = client.blockByTime(unixTs, closest)
      val block = env.resultScalar.flatMap(parseLong)
      val schema = StructType(Seq(
        StructField("unix_ts", LongType), StructField("closest", StringType),
        StructField("block_number", LongType), StructField("api_status", StringType),
        StructField("api_message", StringType)))
      val row = Row(unixTs, closest, jl(block), env.status, env.message)
      val df = spark.createDataFrame(Seq(row).asJava, schema)
        .withColumn("ts_utc", timestamp_seconds(col("unix_ts")))
        .withColumn("inserted_at", current_timestamp())
      store.upsertBlockCheck(df)
      store.jobFinish(jobId, "success",
        stats = Some(s"""{"block_number":${block.getOrElse(-1L)},"status":"${env.status}"}"""))
      BlockByTimeResult(block, env.status, env.message)
    } catch {
      case e: Throwable =>
        store.jobFinish(jobId, "error", error = Some(e.toString)); throw e
    }
  }

  final case class SnapshotResult(rows: Long, pages: Int, token: String, decimals: Int)

  /** E2 ingest (`merlin_etl.py:241-341`): paged holder snapshot into
    * holders_raw. All pages accumulate into ONE upsert of the (token,
    * bucket) partition — per-page commits in the reference exist only
    * because Postgres lacks atomic multi-page writes; the final state
    * is identical and the partition write is atomic per job.
    */
  def holdersSnapshot(spark: SparkSession, store: MerlStore, client: ExplorerClient,
                      token: String, bucketStartUtc: java.time.Instant, triggerId: String,
                      pageSize: Int = 100, maxPages: Int = 10000,
                      defaultDecimals: Int = 18): SnapshotResult = {
    val jobId = store.jobStart("holders_6h")
    try {
      var decimals = defaultDecimals
      val rows = ArrayBuffer.empty[Row]
      var pages = 0
      var page = 1
      var done = false
      while (!done && page <= maxPages) {
        val env = client.holderPage(token, page, pageSize)
        if (!env.ok || env.resultItems.isEmpty) done = true
        else {
          for (it <- env.resultItems) {
            // Schema-drift-tolerant field coalescing (merlin_etl.py:276-284),
            // shared with the DSv2 reader via [[HolderFields]]
            val addr = graft.sources.HolderFields.addr(it)
            val qty = graft.sources.HolderFields.qty(it)
            graft.sources.HolderFields.dec(it)
              .foreach(d => decimals = d) // sticky detection
            (addr, qty) match {
              case (Some(a), Some(q)) =>
                rows += Row(triggerId, token.toLowerCase, a.toLowerCase, decimals, q)
              case _ => () // null-row drop (merlin_etl.py:291-292)
            }
          }
          pages += 1
          if (env.resultItems.size < pageSize) done = true else page += 1
        }
      }
      val schema = StructType(Seq(
        StructField("trigger_id", StringType), StructField("contract_address", StringType),
        StructField("holder_address", StringType), StructField("token_decimal", IntegerType),
        StructField("quantity_raw", StringType)))
      val df = spark.createDataFrame(rows.asJava, schema)
        .withColumn("bucket_start_utc", lit(java.sql.Timestamp.from(bucketStartUtc)))
        .withColumn("bucket_unix", unix_timestamp(col("bucket_start_utc")))
        .withColumn("quantity_18d", AmountFns.scale18(col("quantity_raw")))
      if (rows.nonEmpty) store.upsertHolders(df)
      store.jobFinish(jobId, "success",
        stats = Some(s"""{"rows":${rows.size},"pages":$pages,"token":"$token","decimals":$decimals}"""))
      SnapshotResult(rows.size, pages, token, decimals)
    } catch {
      case e: Throwable =>
        store.jobFinish(jobId, "error", error = Some(e.toString)); throw e
    }
  }

  /** E2 ingest over a DUMPED page directory via the partition-parallel
    * DSv2 `merlin` source ([[graft.sources.MerlinSource]]) — the bulk/
    * offline-backfill twin of [[holdersSnapshot]] (SURVEY S1's named
    * v2). Produces a byte-identical `holders_raw` state to the
    * sequential loop (IngestSpec proves it on shared fixtures) while
    * the page PARSE work scales with the cluster.
    *
    * The two order-dependent pieces of the loop are reconstructed from
    * per-page metadata (ONE tiny aggregate — one row per dumped page,
    * bounded by `maxPages`, planning-scale not data-scale):
    *
    *  - '''Termination''': the loop stops at the first `!ok`/empty
    *    page and AFTER the first short page. Both are visible in the
    *    per-page RAW item counts (the reader emits items before any
    *    null-drop, so a dropped row can never masquerade as a short
    *    page); the replayed cutoff keeps exactly the pages the loop
    *    would have processed. Pages past the cutoff were read
    *    speculatively and are filtered — bounded waste, no wrong rows.
    *  - '''Sticky decimals''': within a page, `last(decimals_obs)
    *    ignoreNulls` over `(page, idx)` — a PER-PAGE window, so it
    *    parallelizes; across pages, the carry-in value per page is
    *    computed on the driver from per-page last-observed values and
    *    broadcast as a literal map. Together they give each row the
    *    exact "latest observation at or before me" the sequential
    *    loop gave it.
    */
  def holdersSnapshotParallel(spark: SparkSession, store: MerlStore, dumpDir: String,
                              token: String, bucketStartUtc: java.time.Instant,
                              triggerId: String, pageSize: Int = 100,
                              maxPages: Int = 10000, defaultDecimals: Int = 18,
                              pagesPerPartition: Int = 8): SnapshotResult = {
    import org.apache.spark.sql.expressions.Window
    val jobId = store.jobStart("holders_6h")
    try {
      val raw = spark.read.format("merlin")
        .option("dir", dumpDir).option("contractaddress", token)
        .option("pagesize", pageSize).option("maxpages", maxPages)
        .option("pagesperpartition", pagesPerPartition)
        .load()

      val meta = raw.groupBy(col("page")).agg(
          count(lit(1)).as("cnt"),
          max(when(col("decimals_obs").isNotNull, struct(col("idx"), col("decimals_obs"))))
            .getField("decimals_obs").as("last_dec"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getInt(2)))))
        .toMap

      // Replay the sequential loop's control flow over the metadata.
      val carryIn = scala.collection.mutable.Map.empty[Int, Int]
      var sticky = defaultDecimals
      var lastKept = 0
      var pages = 0
      var p = 1
      var continue = true
      while (continue && p <= maxPages) {
        meta.get(p) match {
          case Some((cnt, lastDec)) if cnt > 0 =>
            carryIn(p) = sticky
            lastDec.foreach(sticky = _)
            lastKept = p
            pages += 1
            if (cnt < pageSize) continue = false else p += 1
          case _ => continue = false
        }
      }

      val w = Window.partitionBy(col("page")).orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val carryLit = typedLit(carryIn.toMap)
      val frame = raw.filter(col("page") <= lit(lastKept))
        .withColumn("dec_eff", coalesce(
          last(col("decimals_obs"), ignoreNulls = true).over(w),
          element_at(carryLit, col("page"))))
        .filter(col("holder_address").isNotNull && col("quantity_raw").isNotNull)
        .select(
          lit(triggerId).as("trigger_id"),
          lit(token.toLowerCase).as("contract_address"),
          lower(col("holder_address")).as("holder_address"),
          col("dec_eff").cast(IntegerType).as("token_decimal"),
          col("quantity_raw"))
        .withColumn("bucket_start_utc", lit(java.sql.Timestamp.from(bucketStartUtc)))
        .withColumn("bucket_unix", unix_timestamp(col("bucket_start_utc")))
        .withColumn("quantity_18d", AmountFns.scale18(col("quantity_raw")))

      val rows =
        if (lastKept == 0) 0L
        else {
          frame.persist()
          try {
            val c = frame.count()
            if (c > 0) store.upsertHolders(frame)
            c
          } finally frame.unpersist(blocking = false)
        }
      store.jobFinish(jobId, "success",
        stats = Some(s"""{"rows":$rows,"pages":$pages,"token":"$token","decimals":$sticky}"""))
      SnapshotResult(rows, pages, token, sticky)
    } catch {
      case e: Throwable =>
        store.jobFinish(jobId, "error", error = Some(e.toString)); throw e
    }
  }

  final case class HoldersTop100Result(snapshot: SnapshotResult, top100Rows: Long,
                                       bucketStartUtc: java.time.Instant, triggerId: String)

  /** E2 one-shot orchestration (`run_holders_and_top100.sh:31-47`):
    * floor `asOf` to the current 6-hour UTC bucket, ingest the holder
    * snapshot for that bucket (idempotent within bucket), derive the
    * Top-100 from the latest bucket (`run_top100.sh` →
    * `top100_compute.sql`), and optionally send the snapshot report.
    * `asOf` is explicit so runs are deterministic (production passes
    * now()); the reference's timeout fuse and flock remain scheduler
    * concerns (SURVEY §7.4).
    */
  def holdersAndTop100(spark: SparkSession, store: MerlStore, client: ExplorerClient,
                       token: String, asOf: java.time.Instant,
                       pageSize: Int = 500, maxPages: Int = 100000, k: Int = 100,
                       notifier: Option[Report.Notifier] = None,
                       parallelDumpDir: Option[String] = None): HoldersTop100Result = {
    val bucketStart = java.time.Instant.ofEpochSecond(asOf.getEpochSecond / 21600 * 21600)
    val triggerId = java.time.format.DateTimeFormatter.ofPattern("yyyy/MM/dd-HH:mm")
      .withZone(java.time.ZoneOffset.UTC).format(asOf)
    // Behind-a-flag DSv2 path: a dump directory routes the snapshot
    // through the partition-parallel merlin reader instead of the
    // driver-side page loop (identical resulting state — IngestSpec).
    val snap = parallelDumpDir match {
      case Some(d) => holdersSnapshotParallel(spark, store, d, token, bucketStart,
        triggerId, pageSize, maxPages)
      case None => holdersSnapshot(spark, store, client, token, bucketStart, triggerId,
        pageSize, maxPages)
    }
    val top = graft.domain.Top100.computeForToken(store.read("holders_raw"), token, k)
    store.refreshTop100(top)
    // count THIS bucket's refreshed rows — the table keeps earlier
    // bucket partitions (dynamic overwrite touches only this one)
    val rows = store.read("refined_wallet_top100")
      .filter(org.apache.spark.sql.functions.col("contract_address") === token.toLowerCase)
      .filter(org.apache.spark.sql.functions.col("bucket_unix") === bucketStart.getEpochSecond)
      .count()
    notifier.foreach(n => Report.snapshotReport(spark, store, token, n))
    HoldersTop100Result(snap, rows, bucketStart, triggerId)
  }

  final case class TokenTxResult(rows: Long, pages: Int, wallet: String,
                                 token: String, lastBlock: Long)

  /** E1 main (`merlin_etl.py:346-479`): paged, resumable tokentx
    * ingest for (wallet, token). Pages buffer driver-side (the 3 QPS
    * API is the bottleneck and a page is ≤100 rows) and land as ONE
    * insert-ignore append plus ONE cursor merge per `flushPages`
    * window (typically one per job) — the reference checkpoints after
    * every page only because each Postgres page-insert is a cheap
    * row-level round trip; on Spark a per-page write is an anti-join
    * against the full accumulated table plus a cursors rewrite, i.e.
    * O(pages × table) work per job, quadratic in history at scale.
    * Batching drops crash-resume granularity from page to flush
    * window, which M2's idempotent key makes safe: a replayed window
    * re-fetches from the saved cursor and the anti-join drops every
    * already-stored row. The append prunes the existing-side scan to
    * this job's token partition (`contract_address` is the table's
    * partition key), so dedup work scales with the token's history,
    * not the whole table.
    */
  def walletTokenTx(spark: SparkSession, store: MerlStore, client: ExplorerClient,
                    wallet: String, token: String, startBlock: Long = 0,
                    pageSize: Int = 100, maxPages: Int = 100000,
                    flushPages: Int = 200): TokenTxResult = {
    val stream = s"tokentx:${wallet.toLowerCase}:${token.toLowerCase}"
    var lastBlock = store.cursorGet(stream).map(_._1).filter(_ > 0)
      .map(math.max(_, startBlock)).getOrElse(startBlock)
    val jobId = store.jobStart("wallet_tx_hourly")
    val buffered = ArrayBuffer.empty[Row]
    var pages = 0
    var totalRows = 0L
    // Flush a buffered batch as ONE pruned anti-join append + ONE
    // cursor merge. `flushPages` bounds driver memory on huge
    // backfills (200 pages × 500 rows ≈ 100k buffered rows max) and is
    // also the crash-resume granularity: a failure loses at most one
    // flush window of fetching, never the whole job.
    def flush(lastDonePage: Int, meta: String): Unit = if (buffered.nonEmpty) {
      store.appendWalletTransactions(txFrame(spark, buffered.toSeq),
        contracts = Some(Seq(token.toLowerCase)))
      store.cursorUpsert(stream, Some(lastBlock), Some(lastDonePage), meta)
      totalRows += buffered.size
      buffered.clear()
    }
    try {
      var page = 1
      var lastDonePage = 0
      var meta = "{}"
      var done = false
      while (!done && pages < maxPages) {
        val env = client.tokenTxPage(wallet, token, lastBlock, page, pageSize)
        meta = probeMetaJson(env.status, env.message)
        if (!env.ok || env.resultItems.isEmpty) done = true
        else {
          buffered ++= env.resultItems.map { it =>
            val blockNumber = it.get("blockNumber").flatMap(parseLong).getOrElse(0L)
            lastBlock = math.max(lastBlock, blockNumber)
            Row(
              wallet.toLowerCase, token.toLowerCase, blockNumber,
              it.get("timeStamp").flatMap(parseLong).getOrElse(0L),
              it.get("hash").orNull,
              jl(it.get("nonce").flatMap(parseLong)),
              it.get("blockHash").orNull,
              it.get("from").map(_.toLowerCase).getOrElse(""),
              it.get("to").map(_.toLowerCase).getOrElse(""),
              it.get("value").filter(_.nonEmpty).getOrElse("0"),
              it.get("tokenName").orNull,
              it.get("tokenSymbol").orNull,
              it.get("tokenDecimal").flatMap(parseInt).getOrElse(18),
              it.get("transactionIndex").flatMap(parseInt).getOrElse(0),
              jl(it.get("gas").flatMap(parseLong)),
              it.get("gasPrice").orNull,
              jl(it.get("gasUsed").flatMap(parseLong)),
              jl(it.get("cumulativeGasUsed").flatMap(parseLong)),
              it.get("input").orNull,
              jl(it.get("confirmations").flatMap(parseLong)))
          }
          pages += 1
          lastDonePage = page
          if (pages % flushPages == 0) flush(lastDonePage, meta)
          if (env.resultItems.size < pageSize) done = true else page += 1
        }
      }
      // Always record the final probe outcome on the cursor. When the
      // terminating envelope arrives exactly at a flush boundary the
      // buffer is empty and flush is a no-op — the cursor would keep
      // the previous window's OK meta instead of this probe's
      // status/message (the reference records every probe outcome,
      // merlin_etl.py:463). This branch also covers no-new-rows runs.
      if (buffered.nonEmpty) flush(lastDonePage, meta)
      else store.cursorUpsert(stream, Some(lastBlock), Some(lastDonePage), meta)
      store.jobFinish(jobId, "success", stats = Some(
        s"""{"rows":$totalRows,"pages":$pages,"wallet":"$wallet","token":"$token","last_block":$lastBlock}"""))
      TokenTxResult(totalRows, pages, wallet, token, lastBlock)
    } catch {
      case e: Throwable =>
        store.jobFinish(jobId, "error", error = Some(e.toString)); throw e
    }
  }

  /** E1 ingest over a DUMPED page directory via the partition-parallel
    * DSv2 `merlin` source in tokentx mode — the bulk/offline-backfill
    * twin of [[walletTokenTx]] (SURVEY S6's v2), producing identical
    * `wallet_transactions` + cursor state to the sequential loop on
    * the same dump (MerlinSourceSpec proves it) while the page PARSE
    * work scales with the cluster.
    *
    * The order dependence is stronger here than for holders: page
    * N+1's REQUEST — its `startblock` param, hence its dump filename —
    * carries the running max block of pages 1..N. So the source parses
    * every candidate (page, startblock) file in parallel, and this
    * function replays the chain over a per-file metadata aggregate
    * (raw count + max parsed block; one row per dumped file,
    * planning-scale): start at (1, cursor), follow (page+1,
    * max-so-far) while pages are full, stop at the first missing/!ok/
    * empty file or after a short page — exactly the sequential control
    * flow. Files the chain never visits (stale runs, pages past
    * termination) were parsed speculatively and are filtered — bounded
    * waste, never wrong rows. The terminating probe's status/message
    * (the cursor metadata the reference records, merlin_etl.py:463) is
    * re-read with ONE bounded driver-side call.
    */
  def walletTokenTxParallel(spark: SparkSession, store: MerlStore, dumpDir: String,
                            wallet: String, token: String, startBlock: Long = 0,
                            pageSize: Int = 100, maxPages: Int = 100000,
                            pagesPerPartition: Int = 8): TokenTxResult = {
    val stream = s"tokentx:${wallet.toLowerCase}:${token.toLowerCase}"
    val initBlock = store.cursorGet(stream).map(_._1).filter(_ > 0)
      .map(math.max(_, startBlock)).getOrElse(startBlock)
    val jobId = store.jobStart("wallet_tx_hourly")
    try {
      val raw = spark.read.format("merlin")
        .option("mode", "tokentx").option("dir", dumpDir)
        .option("address", wallet).option("contractaddress", token)
        .option("pagesize", pageSize).option("maxpages", maxPages)
        .option("pagesperpartition", pagesPerPartition)
        .load()

      val meta = raw.groupBy(col("page"), col("start_block")).agg(
          count(lit(1)).as("cnt"),
          max(coalesce(col("block_number").try_cast(LongType), lit(0L))).as("max_blk"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap

      // Replay the sequential loop's control flow over the metadata.
      var lastBlock = initBlock
      var page = 1
      var pages = 0
      var lastDonePage = 0
      var done = false
      var lastProbe: Option[(Int, Long)] = None
      val kept = scala.collection.mutable.Map.empty[Int, Long]
      var totalRows = 0L
      while (!done && pages < maxPages) {
        lastProbe = Some((page, lastBlock))
        meta.get((page, lastBlock)) match {
          case Some((cnt, maxBlk)) if cnt > 0 =>
            kept(page) = lastBlock
            totalRows += cnt
            lastBlock = math.max(lastBlock, maxBlk)
            pages += 1
            lastDonePage = page
            if (cnt < pageSize) done = true else page += 1
          case _ => done = true
        }
      }

      // The final probe's envelope → cursor metadata (one bounded
      // read; a missing file resolves to the explorer's no-data
      // envelope, exactly what the sequential loop's probe saw).
      val metaJson = lastProbe match {
        case Some((p, s)) =>
          val env = new ExplorerClient(new HadoopTransport(dumpDir))
            .tokenTxPage(wallet, token, s, p, pageSize)
          probeMetaJson(env.status, env.message)
        case None => "{}"
      }

      // Keep exactly the chain's (page, startblock) files, then mirror
      // the sequential loop's per-field parse-with-default semantics
      // as codegen'd expressions (try_cast ≡ parse_int-style
      // null-on-failure).
      val keptLit = typedLit(kept.toMap)
      val parsed = raw
        .filter(element_at(keptLit, col("page")) === col("start_block"))
        .select(
          lit(wallet.toLowerCase).as("wallet_address"),
          lit(token.toLowerCase).as("contract_address"),
          coalesce(col("block_number").try_cast(LongType), lit(0L)).as("block_number"),
          coalesce(col("time_stamp").try_cast(LongType), lit(0L)).as("block_time_unix"),
          col("tx_hash"),
          col("nonce").try_cast(LongType).as("nonce"),
          col("block_hash"),
          coalesce(lower(col("from_address")), lit("")).as("from_address"),
          coalesce(lower(col("to_address")), lit("")).as("to_address"),
          when(col("value_raw").isNull || col("value_raw") === "", "0")
            .otherwise(col("value_raw")).as("value_raw"),
          col("token_name"),
          col("token_symbol"),
          coalesce(col("token_decimal").try_cast(IntegerType), lit(18)).as("token_decimal"),
          coalesce(col("transaction_index").try_cast(IntegerType), lit(0)).as("transaction_index"),
          col("gas").try_cast(LongType).as("gas"),
          col("gas_price"),
          col("gas_used").try_cast(LongType).as("gas_used"),
          col("cumulative_gas_used").try_cast(LongType).as("cumulative_gas_used"),
          col("input"),
          col("confirmations").try_cast(LongType).as("confirmations"))

      if (totalRows > 0)
        store.appendWalletTransactions(txEnrich(parsed),
          contracts = Some(Seq(token.toLowerCase)))
      store.cursorUpsert(stream, Some(lastBlock), Some(lastDonePage), metaJson)
      store.jobFinish(jobId, "success", stats = Some(
        s"""{"rows":$totalRows,"pages":$pages,"wallet":"$wallet","token":"$token","last_block":$lastBlock}"""))
      TokenTxResult(totalRows, pages, wallet, token, lastBlock)
    } catch {
      case e: Throwable =>
        store.jobFinish(jobId, "error", error = Some(e.toString)); throw e
    }
  }

  private val txIngestSchema = StructType(Seq(
    StructField("wallet_address", StringType), StructField("contract_address", StringType),
    StructField("block_number", LongType), StructField("block_time_unix", LongType),
    StructField("tx_hash", StringType), StructField("nonce", LongType),
    StructField("block_hash", StringType), StructField("from_address", StringType),
    StructField("to_address", StringType), StructField("value_raw", StringType),
    StructField("token_name", StringType), StructField("token_symbol", StringType),
    StructField("token_decimal", IntegerType), StructField("transaction_index", IntegerType),
    StructField("gas", LongType), StructField("gas_price", StringType),
    StructField("gas_used", LongType), StructField("cumulative_gas_used", LongType),
    StructField("input", StringType), StructField("confirmations", LongType)))

  private def txFrame(spark: SparkSession, rows: Seq[Row]): DataFrame =
    txEnrich(spark.createDataFrame(rows.asJava, txIngestSchema))

  /** Shared post-parse enrichment of a txIngestSchema-shaped frame —
    * ONE definition for the sequential loop and the DSv2 parallel
    * path, so the derived columns cannot drift.
    */
  private def txEnrich(df: DataFrame): DataFrame =
    df.withColumn("wallet_name", lit(null).cast(StringType))
      .withColumn("wallet_tag", lit(null).cast(StringType))
      .withColumn("block_time_utc", timestamp_seconds(col("block_time_unix")))
      .withColumn("value_18d", AmountFns.scale18(col("value_raw")))
      .withColumn("gas_price", col("gas_price").try_cast(DecimalType(38, 0)))
      .withColumn("ingested_at", current_timestamp())
}
