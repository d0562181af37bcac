package graft.pipelines

import graft.SparkSpec
import graft.domain.MerlStore
import graft.sources.{ExplorerClient, FileTransport}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** E1/E2 pipelines against JSON fixtures (no network): pagination,
  * short-page/status termination, schema-drift field coalescing,
  * cursor resume, insert-ignore re-runs, job audit.
  */
class IngestSpec extends SparkSpec {

  private def freshDirs(): (String, MerlStore, FileTransport, ExplorerClient) = {
    val fixtures = Files.createTempDirectory("graft_api").toString
    val store = new MerlStore(spark, Files.createTempDirectory("graft_store").toString)
    val t = new FileTransport(fixtures)
    (fixtures, store, t, new ExplorerClient(t))
  }

  private def write(dir: String, t: FileTransport, params: Map[String, String], body: String): Unit =
    Files.writeString(Paths.get(dir, t.fixtureName(params)), body)

  private def holderParams(token: String, page: Int, size: Int) = Map(
    "module" -> "token", "action" -> "tokenholderlist", "contractaddress" -> token,
    "page" -> page.toString, "offset" -> size.toString)

  private def txParams(wallet: String, token: String, start: Long, page: Int, size: Int) = Map(
    "module" -> "account", "action" -> "tokentx", "address" -> wallet,
    "contractaddress" -> token, "startblock" -> start.toString, "endblock" -> "99999999",
    "sort" -> "asc", "page" -> page.toString, "offset" -> size.toString)

  test("holders snapshot: paging, drift coalescing, null drop, sticky decimals, idempotent re-run") {
    val (fx, store, t, client) = freshDirs()
    // page 1 (full): one canonical item, one missing-quantity item (dropped)
    write(fx, t, holderParams("0xabc", 1, 2),
      """{"status":"1","message":"OK","result":[
        |{"TokenHolderAddress":"0xAAA","TokenHolderQuantity":"1000","decimals":"8"},
        |{"TokenHolderAddress":"0xBAD"}]}""".stripMargin)
    // page 2 (short → stop): drifted field names, no decimals (sticky 8)
    write(fx, t, holderParams("0xabc", 2, 2),
      """{"status":"1","message":"OK","result":[
        |{"holderAddress":"0xBBB","balance":"2500"}]}""".stripMargin)

    val bucket = java.time.Instant.parse("2024-01-15T06:00:00Z")
    val r = Ingest.holdersSnapshot(spark, store, client, "0xabc", bucket, "2024/01/15-06",
      pageSize = 2, maxPages = 10)
    assert(r.rows == 2 && r.pages == 2 && r.decimals == 8)

    val got = store.read("holders_raw")
      .select("holder_address", "token_decimal", "quantity_raw")
      .collect().map(x => (x.getString(0), x.getInt(1), x.getString(2))).toSet
    assert(got == Set(("0xaaa", 8, "1000"), ("0xbbb", 8, "2500")))

    // M1: re-running the same snapshot replaces the bucket, never doubles
    Ingest.holdersSnapshot(spark, store, client, "0xabc", bucket, "2024/01/15-06",
      pageSize = 2, maxPages = 10)
    assert(store.read("holders_raw").count() == 2)

    val jobs = store.read("job_runs").filter(col("job_name") === "holders_6h")
    assert(jobs.count() == 2 && jobs.filter(col("status") === "success").count() == 2)
  }

  test("tokentx: pagination with running startblock, cursor resume, insert-ignore") {
    val (fx, store, t, client) = freshDirs()
    // run 1, page 1 (full, blocks 10 & 20) — next request carries startblock=20
    write(fx, t, txParams("0xW1", "0xabc", 0, 1, 2),
      """{"status":"1","message":"OK","result":[
        |{"blockNumber":"10","timeStamp":"1700000000","hash":"0xh1","from":"0xW1","to":"0xX","value":"100","tokenDecimal":"18","transactionIndex":"1"},
        |{"blockNumber":"20","timeStamp":"1700000600","hash":"0xh2","from":"0xY","to":"0xW1","value":"200","tokenDecimal":"18","transactionIndex":"2"}]}""".stripMargin)
    // run 1, page 2 (short → stop), block 25
    write(fx, t, txParams("0xW1", "0xabc", 20, 2, 2),
      """{"status":"1","message":"OK","result":[
        |{"blockNumber":"25","timeStamp":"1700001200","hash":"0xh3","from":"0xW1","to":"0xZ","value":"300"}]}""".stripMargin)

    val r1 = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0, pageSize = 2)
    assert(r1.rows == 3 && r1.pages == 2 && r1.lastBlock == 25)
    assert(store.read("wallet_transactions").count() == 3)
    assert(store.cursorGet("tokentx:0xw1:0xabc").contains((25L, 2)))

    // run 2: resumes from block 25; no fixture there → status-0 stop, nothing new
    val r2 = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0, pageSize = 2)
    assert(r2.rows == 0 && r2.lastBlock == 25)
    assert(store.read("wallet_transactions").count() == 3)

    // run 3: drop the cursor (simulating lost bookkeeping) and replay
    // from genesis — the same pages re-serve and every row must be
    // dup-ignored by the coalesce'd natural key
    import scala.reflect.io.Directory
    new Directory(new java.io.File(store.path("ingestion_cursors"))).deleteRecursively()
    val r3 = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0, pageSize = 2)
    assert(r3.rows == 3 && r3.lastBlock == 25, "pages re-served after cursor loss")
    assert(store.read("wallet_transactions").count() == 3, "insert-ignore must hold on replay")

    val addrs = store.read("wallet_transactions")
      .select("wallet_address", "from_address", "to_address")
      .collect().flatMap(r => Seq(r.getString(0), r.getString(1), r.getString(2)))
    assert(addrs.forall(a => a == a.toLowerCase), "addresses lowercased at ingest")
  }

  test("tokentx 50-page job lands as ONE append + ONE cursor merge (no per-page table reads)") {
    val fixtures = Files.createTempDirectory("graft_api").toString
    class CountingStore(root: String) extends MerlStore(spark, root) {
      val reads = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      override def read(table: String): org.apache.spark.sql.DataFrame = {
        reads(table) += 1; super.read(table)
      }
    }
    val store = new CountingStore(Files.createTempDirectory("graft_store").toString)
    val t = new FileTransport(fixtures)
    val client = new ExplorerClient(t)

    // 50 pages: p<50 carry blocks (10p, 10p+5); page 50 is short (one
    // row, block 500) and terminates. Each page's startblock is the
    // previous page's max block — the running-cursor request pattern.
    var start = 0L
    for (p <- 1 to 50) {
      val blocks = if (p < 50) Seq(10L * p, 10L * p + 5) else Seq(10L * p)
      val items = blocks.map(b =>
        s"""{"blockNumber":"$b","timeStamp":"${1700000000L + b}","hash":"0xh$b",""" +
          s""""from":"0xW1","to":"0xZ","value":"$b","tokenDecimal":"18","transactionIndex":"0"}""")
        .mkString(",")
      write(fixtures, t, txParams("0xW1", "0xabc", start, p, 2),
        s"""{"status":"1","message":"OK","result":[$items]}""")
      start = blocks.max
    }

    val r1 = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0, pageSize = 2)
    assert(r1.rows == 99 && r1.pages == 50 && r1.lastBlock == 500)
    assert(store.read("wallet_transactions").count() == 99)
    assert(store.cursorGet("tokentx:0xw1:0xabc").contains((500L, 50)))

    // Replay from genesis (cursor dropped): all 50 pages re-serve, and
    // the dedup work must still be ONE pruned anti-join read of
    // wallet_transactions and ≤2 cursor-table reads (get + merge) —
    // NOT one per page.
    import scala.reflect.io.Directory
    new Directory(new java.io.File(store.path("ingestion_cursors"))).deleteRecursively()
    store.reads.clear()
    val r2 = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0, pageSize = 2)
    assert(r2.rows == 99 && r2.pages == 50)
    assert(store.reads("wallet_transactions") <= 1,
      s"per-page anti-join regression: ${store.reads("wallet_transactions")} reads for 50 pages")
    assert(store.reads("ingestion_cursors") <= 2,
      s"per-page cursor-rewrite regression: ${store.reads("ingestion_cursors")} reads for 50 pages")
    assert(store.read("wallet_transactions").count() == 99, "insert-ignore holds on replay")
  }

  test("failed probe after a successful flush records the error meta on the cursor") {
    val (fx, store, t, client) = freshDirs()
    // page 1 (full) flushes immediately (flushPages=1): cursor carries
    // the OK meta. Page 2 fails with the buffer EMPTY — exactly the
    // flush boundary — and the cursor must still record THAT outcome,
    // not keep page 1's OK meta (the reference records every probe).
    write(fx, t, txParams("0xW1", "0xabc", 0, 1, 2),
      """{"status":"1","message":"OK","result":[
        |{"blockNumber":"10","timeStamp":"1700000000","hash":"0xh1","from":"0xW1","to":"0xX","value":"100","tokenDecimal":"18","transactionIndex":"1"},
        |{"blockNumber":"20","timeStamp":"1700000600","hash":"0xh2","from":"0xY","to":"0xW1","value":"200","tokenDecimal":"18","transactionIndex":"2"}]}""".stripMargin)
    write(fx, t, txParams("0xW1", "0xabc", 20, 2, 2),
      """{"status":"0","message":"NOTOK-RATELIMIT","result":[]}""")

    val r = Ingest.walletTokenTx(spark, store, client, "0xW1", "0xabc", 0,
      pageSize = 2, flushPages = 1)
    assert(r.rows == 2 && r.pages == 1 && r.lastBlock == 20)
    val meta = store.read("ingestion_cursors")
      .filter(col("stream") === "tokentx:0xw1:0xabc")
      .select("metadata").collect().map(_.getString(0)).toSeq
    assert(meta.size == 1 && meta.head.contains("NOTOK-RATELIMIT"),
      s"cursor must record the final probe outcome, got: $meta")
    assert(store.cursorGet("tokentx:0xw1:0xabc").contains((20L, 1)))
  }

  test("holders_and_top100 one-shot: snapshot -> refine -> report (run_holders_and_top100.sh)") {
    val (fx, store, t, client) = freshDirs()
    // one full page (2 holders) + short page (1 holder); fixture keys
    // carry the token exactly as the CLI passes it (mixed case)
    write(fx, t, holderParams("0xABC", 1, 2),
      """{"status":"1","message":"OK","result":[
        |{"TokenHolderAddress":"0xW1","TokenHolderQuantity":"5000000000000000000000","decimals":"18"},
        |{"TokenHolderAddress":"0xW2","TokenHolderQuantity":"1000000000000000000000"}]}""".stripMargin)
    write(fx, t, holderParams("0xABC", 2, 2),
      """{"status":"1","message":"OK","result":[
        |{"TokenHolderAddress":"0xW3","TokenHolderQuantity":"7000000000000000000"}]}""".stripMargin)

    val asOf = java.time.Instant.parse("2024-01-15T08:30:00Z") // floors to 06:00Z
    val notifier = new Report.StringNotifier
    val r = Ingest.holdersAndTop100(spark, store, client, "0xABC", asOf,
      pageSize = 2, maxPages = 10, k = 2, notifier = Some(notifier))

    assert(r.snapshot.rows == 3 && r.snapshot.pages == 2)
    assert(r.bucketStartUtc == java.time.Instant.parse("2024-01-15T06:00:00Z"))
    assert(r.triggerId == "2024/01/15-08:30")
    assert(r.top100Rows == 2, "k=2 refine keeps the top 2 holders")

    val top = store.read("refined_wallet_top100")
      .select("holder_address", "rnk")
      .collect().map(x => (x.getString(0), x.getInt(1))).toSet
    assert(top == Set(("0xw1", 1), ("0xw2", 2)))

    // report went out through the same store state
    assert(notifier.messages.size == 1)
    val msg = notifier.messages.head._1
    assert(msg.contains("<i>Bucket:</i> <code>2024-01-15 06:00Z</code>"))
    assert(msg.contains("<i>Total holders:</i> <b>3</b>"))
    assert(msg.contains("<b>#1</b> <a href=\"https://scan.merlinchain.io/address/0xw1\">"))

    // idempotent within bucket: re-running replaces, never doubles
    val r2 = Ingest.holdersAndTop100(spark, store, client, "0xABC", asOf,
      pageSize = 2, maxPages = 10, k = 2)
    assert(r2.top100Rows == 2)
    assert(store.read("holders_raw").count() == 3)
  }

  test("block_by_time: probe upserts on (unix_ts, closest)") {
    val (fx, store, t, client) = freshDirs()
    def probe(body: String) =
      write(fx, t, Map("module" -> "block", "action" -> "getblocknobytime",
        "timestamp" -> "1700000000", "closest" -> "before"), body)
    probe("""{"status":"1","message":"OK","result":"12345"}""")
    val r1 = Ingest.blockByTime(spark, store, client, 1700000000L, "before")
    assert(r1.blockNumber.contains(12345L))
    probe("""{"status":"1","message":"OK","result":"12399"}""")
    Ingest.blockByTime(spark, store, client, 1700000000L, "before")
    val rows = store.read("block_check")
      .select("unix_ts", "closest", "block_number")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1700000000L, "before", 12399L)), "update-on-conflict keeps latest")
  }

  test("probeMetaJson escapes free-text explorer messages into valid JSON") {
    val j = Ingest.probeMetaJson("0", """rate "limit" hit \ retry
later""")
    // parseable by the engine's own JSON reader
    val ss = spark; import ss.implicits._
    val parsed = ss.read.json(Seq(j).toDS())
    val row = parsed.select("status", "message").collect().head
    assert(row.getString(0) == "0")
    assert(row.getString(1).contains("\"limit\"") && row.getString(1).contains("\\"))
  }
}
