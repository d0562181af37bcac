package graft.sources

import graft.SparkSpec
import graft.domain.MerlStore
import graft.pipelines.Ingest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** DSv2 `merlin` source (SURVEY S1's v2 evolution): the partition-
  * parallel dumped-page reader must produce a BYTE-IDENTICAL
  * `holders_raw` state to the driver-side sequential loop on the same
  * fixtures — including the order-dependent pieces (termination at
  * !ok/empty/short pages, sticky decimals across page AND partition
  * boundaries) and the traps (a null-dropped item must not fake a
  * short page).
  */
class MerlinSourceSpec extends SparkSpec {

  private def freshFixtures(): (String, FileTransport) = {
    val d = Files.createTempDirectory("graft_dump").toString
    (d, new FileTransport(d))
  }

  private def write(dir: String, t: FileTransport, token: String, page: Int,
                    size: Int, body: String): Unit =
    Files.writeString(
      Paths.get(dir, t.fixtureName(HolderFields.pageParams(token, page, size))), body)

  private def item(addr: String, qty: String, dec: Option[Int] = None): String =
    s"""{"TokenHolderAddress":"$addr","TokenHolderQuantity":"$qty"""" +
      dec.map(d => s""","decimals":"$d"""").getOrElse("") + "}"

  /** Run both ingest paths on the same dump and return the two stored
    * holder tables as comparable row sets plus the two results.
    */
  private def bothPaths(dump: String, token: String, pageSize: Int,
                        pagesPerPartition: Int = 2, maxPages: Int = 10000) = {
    val bucket = java.time.Instant.parse("2024-01-15T06:00:00Z")
    val storeA = new MerlStore(spark, Files.createTempDirectory("graft_seq").toString)
    val storeB = new MerlStore(spark, Files.createTempDirectory("graft_par").toString)
    val client = new ExplorerClient(new FileTransport(dump))
    val rA = Ingest.holdersSnapshot(spark, storeA, client, token, bucket,
      "2024/01/15-06", pageSize, maxPages)
    val rB = Ingest.holdersSnapshotParallel(spark, storeB, dump, token, bucket,
      "2024/01/15-06", pageSize, maxPages, pagesPerPartition = pagesPerPartition)
    def rows(s: MerlStore) =
      if (!Files.exists(Paths.get(s.path("holders_raw")))) Seq.empty[Seq[Any]]
      else s.read("holders_raw")
        .select("trigger_id", "contract_address", "holder_address", "token_decimal",
          "quantity_raw", "bucket_unix", "quantity_18d")
        .collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|"))
    (rA, rB, rows(storeA), rows(storeB))
  }

  test("parallel reader ≡ sequential loop: drift coalescing, null drop, sticky decimals across partitions") {
    val (dump, t) = freshFixtures()
    val token = "0xAbC"
    // page 1: decimals observed mid-page (first item none → default 18,
    // second item sets 8) plus a null-dropped item that must NOT make
    // the page look short (raw count == pageSize)
    write(dump, t, token, 1, 3, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "100")},
      |${item("0xA2", "200", Some(8))},
      |{"TokenHolderAddress":"0xNOQTY"}]}""".stripMargin)
    // page 2: drifted field names, no decimals anywhere — sticky 8 must
    // carry across the page (and, at pagesPerPartition=1..2, across the
    // PARTITION) boundary
    write(dump, t, token, 2, 3, s"""{"status":"1","message":"OK","result":[
      |{"holderAddress":"0xB1","balance":"300"},
      |{"address":"0xB2","quantity":"400"},
      |{"holderAddress":"0xB3","balance":"500"}]}""".stripMargin)
    // page 3: short (1 < 3) → terminates AFTER being ingested
    write(dump, t, token, 3, 3, s"""{"status":"1","message":"OK","result":[
      |${item("0xC1", "600", Some(6))}]}""".stripMargin)
    // page 4: present in the dump but past the short-page termination —
    // the sequential loop never requests it, the parallel path must
    // filter it out
    write(dump, t, token, 4, 3, s"""{"status":"1","message":"OK","result":[
      |${item("0xGHOST", "999")}]}""".stripMargin)

    for (ppp <- Seq(1, 2, 10)) {
      val (rA, rB, rowsA, rowsB) = bothPaths(dump, token, pageSize = 3,
        pagesPerPartition = ppp)
      assert(rA.rows == 6 && rA.pages == 3 && rA.decimals == 6)
      assert((rB.rows, rB.pages, rB.decimals) == ((rA.rows, rA.pages, rA.decimals)),
        s"result mismatch at pagesPerPartition=$ppp")
      assert(rowsA == rowsB, s"stored rows differ at pagesPerPartition=$ppp")
    }

    // the expected sticky-decimals assignment, pinned explicitly
    val (_, _, _, rowsB) = bothPaths(dump, token, pageSize = 3)
    val decByHolder = rowsB.map(r => r(2).toString -> r(3)).toMap
    assert(decByHolder == Map("0xa1" -> 18, "0xa2" -> 8, "0xb1" -> 8, "0xb2" -> 8,
      "0xb3" -> 8, "0xc1" -> 6))
  }

  test("error-envelope page mid-dump terminates both paths at the same point") {
    val (dump, t) = freshFixtures()
    val token = "0xerr"
    write(dump, t, token, 1, 2, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "1", Some(18))}, ${item("0xA2", "2")}]}""".stripMargin)
    // page 2 exists but is a dumped rate-limit error → loop stops before it
    write(dump, t, token, 2, 2, """{"status":"0","message":"NOTOK","result":[]}""")
    write(dump, t, token, 3, 2, s"""{"status":"1","message":"OK","result":[
      |${item("0xGHOST", "9")}, ${item("0xGHOST2", "9")}]}""".stripMargin)

    val (rA, rB, rowsA, rowsB) = bothPaths(dump, token, pageSize = 2)
    assert(rA.rows == 2 && rA.pages == 1)
    assert((rB.rows, rB.pages) == ((rA.rows, rA.pages)))
    assert(rowsA == rowsB)
    assert(!rowsB.exists(_(2).toString.startsWith("0xghost")))
  }

  test("empty dump is empty on both paths; missing-first-page dump fails fast on the parallel path") {
    val (dump, t) = freshFixtures()
    val token = "0xnone"
    val bucket = java.time.Instant.parse("2024-01-15T06:00:00Z")
    // truly empty dump: both paths produce empty state
    val s0 = new MerlStore(spark, Files.createTempDirectory("graft_e0").toString)
    val r0 = Ingest.holdersSnapshotParallel(spark, s0, dump, token, bucket,
      "2024/01/15-06", 2, 10000)
    assert(r0.rows == 0)
    // page 2 exists but page 1 doesn't: a faithful dump of the
    // sequential loop always starts at page 1, so this is a partial/
    // corrupt dump — the planner refuses instead of silently
    // ingesting nothing (the sequential loop, by contrast, cannot
    // tell and returns empty)
    write(dump, t, token, 2, 2, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "1")}]}""".stripMargin)
    val client = new ExplorerClient(new FileTransport(dump))
    val sA = new MerlStore(spark, Files.createTempDirectory("graft_e1").toString)
    val rA = Ingest.holdersSnapshot(spark, sA, client, token, bucket,
      "2024/01/15-06", 2, 10000)
    assert(rA.rows == 0)
    val sB = new MerlStore(spark, Files.createTempDirectory("graft_e2").toString)
    val err = intercept[Exception] {
      Ingest.holdersSnapshotParallel(spark, sB, dump, token, bucket,
        "2024/01/15-06", 2, 10000)
    }
    assert(err.getMessage.contains("no page 1"))
  }

  // ---- tokentx mode -------------------------------------------------

  private def writeTx(dir: String, t: FileTransport, wallet: String, token: String,
                      start: Long, page: Int, size: Int, body: String): Unit =
    Files.writeString(Paths.get(dir,
      t.fixtureName(TxFields.pageParams(wallet, token, start, page, size))), body)

  private def txItem(block: Long, hash: String): String =
    s"""{"blockNumber":"$block","timeStamp":"${1700000000L + block}","hash":"$hash",
       |"nonce":"1","blockHash":"0xb$block","from":"0xF$block","to":"0xT$block",
       |"value":"${block * 10}","tokenName":"Tok","tokenSymbol":"TK",
       |"tokenDecimal":"8","transactionIndex":"0","gas":"21000","gasPrice":"1000",
       |"gasUsed":"21000","cumulativeGasUsed":"42000","input":"0x",
       |"confirmations":"5"}""".stripMargin

  /** Run both tokentx ingest paths on the same dump; return results,
    * stored tables (sans the wall-clock ingested_at) and cursors.
    */
  private def bothTxPaths(dump: String, wallet: String, token: String, pageSize: Int,
                          pagesPerPartition: Int = 2,
                          seedCursor: Option[(Long, Int)] = None) = {
    val storeA = new MerlStore(spark, Files.createTempDirectory("graft_txseq").toString)
    val storeB = new MerlStore(spark, Files.createTempDirectory("graft_txpar").toString)
    val stream = s"tokentx:${wallet.toLowerCase}:${token.toLowerCase}"
    seedCursor.foreach { case (b, p) =>
      storeA.cursorUpsert(stream, Some(b), Some(p))
      storeB.cursorUpsert(stream, Some(b), Some(p))
    }
    val client = new ExplorerClient(new FileTransport(dump))
    val rA = Ingest.walletTokenTx(spark, storeA, client, wallet, token,
      pageSize = pageSize)
    val rB = Ingest.walletTokenTxParallel(spark, storeB, dump, wallet, token,
      pageSize = pageSize, pagesPerPartition = pagesPerPartition)
    def rows(s: MerlStore) =
      if (!Files.exists(Paths.get(s.path("wallet_transactions")))) Seq.empty[Seq[Any]]
      else {
        val df = s.read("wallet_transactions").drop("ingested_at")
        df.select(df.columns.sorted.map(col): _*)
          .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      }
    def cur(s: MerlStore) = s.read("ingestion_cursors")
      .select("stream", "last_scanned_block", "last_page", "metadata")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    (rA, rB, rows(storeA), rows(storeB), cur(storeA), cur(storeB))
  }

  test("tokentx: parallel chain replay ≡ sequential loop (running startblock, dup overlap, decoy + ghost files)") {
    val (dump, t) = freshFixtures()
    val (w, tok) = ("0xW1", "0xAbC")
    // page 1 @ startblock 0: full (blocks 10, 20) → next request
    // carries startblock=20
    writeTx(dump, t, w, tok, 0, 1, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(10, "0xh1")},${txItem(20, "0xh2")}]}""")
    // page 2 @ 20: re-fetch overlap (identical 0xh2 row — insert-ignore
    // must drop it) + block 25, full → next carries 25
    writeTx(dump, t, w, tok, 20, 2, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(20, "0xh2")},${txItem(25, "0xh3")}]}""")
    // page 3 @ 25: SHORT, with a sparse item (missing to/gas/timeStamp,
    // empty value) — parse-with-default parity — then terminate
    writeTx(dump, t, w, tok, 25, 3, 2,
      """{"status":"1","message":"OK","result":[{"blockNumber":"30","hash":"0xh4","value":""}]}""")
    // decoy from a STALE run (page 2 @ startblock 0): the chain never
    // requests it — its rows must not appear
    writeTx(dump, t, w, tok, 0, 2, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(999, "0xEVIL")}]}""")
    // ghost past termination (page 4 @ 30): only reachable if page 3
    // had been full — must be filtered
    writeTx(dump, t, w, tok, 30, 4, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(40, "0xGHOST")},${txItem(41, "0xGHOST2")}]}""")

    for (ppp <- Seq(1, 2, 10)) {
      val (rA, rB, rowsA, rowsB, curA, curB) =
        bothTxPaths(dump, w, tok, pageSize = 2, pagesPerPartition = ppp)
      assert(rA.rows == 5 && rA.pages == 3 && rA.lastBlock == 30)
      assert((rB.rows, rB.pages, rB.lastBlock) == ((rA.rows, rA.pages, rA.lastBlock)),
        s"result mismatch at pagesPerPartition=$ppp")
      assert(rowsA == rowsB, s"stored rows differ at pagesPerPartition=$ppp")
      assert(curA == curB, s"cursors differ at pagesPerPartition=$ppp")
      assert(rowsB.nonEmpty && curB.nonEmpty)
      assert(!rowsB.exists(_.exists(v => v != null &&
        (v.toString.contains("EVIL") || v.toString.contains("GHOST")))))
    }

    // pin the interesting semantics once explicitly
    val (_, _, _, rowsB, _, curB) = bothTxPaths(dump, w, tok, pageSize = 2)
    // 5 raw rows, one TxKey-identical overlap dropped → 4 stored
    assert(rowsB.size == 4)
    // cursor: final block 30, last done page 3, short-page OK meta
    assert(curB == Seq(Seq("tokentx:0xw1:0xabc", 30L, 3,
      """{"status":"1","message":"OK"}""")))
  }

  test("tokentx: error envelope mid-chain terminates both paths identically, meta records the probe") {
    val (dump, t) = freshFixtures()
    val (w, tok) = ("0xW2", "0xDeF")
    writeTx(dump, t, w, tok, 0, 1, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(10, "0xa1")},${txItem(20, "0xa2")}]}""")
    writeTx(dump, t, w, tok, 20, 2, 2,
      """{"status":"0","message":"NOTOK","result":[]}""")
    val (rA, rB, rowsA, rowsB, curA, curB) = bothTxPaths(dump, w, tok, pageSize = 2)
    assert(rA.rows == 2 && rA.pages == 1 && rA.lastBlock == 20)
    assert((rB.rows, rB.pages, rB.lastBlock) == ((rA.rows, rA.pages, rA.lastBlock)))
    assert(rowsA == rowsB && curA == curB)
    assert(curB.head(3) == """{"status":"0","message":"NOTOK"}""")
  }

  test("tokentx: cursor resume starts the chain at the saved block; stale pre-cursor files are skipped") {
    val (dump, t) = freshFixtures()
    val (w, tok) = ("0xW3", "0xAaA")
    // stale page 1 from the pre-cursor era — must be skipped by BOTH
    writeTx(dump, t, w, tok, 0, 1, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(5, "0xOLD")},${txItem(9, "0xOLD2")}]}""")
    // the resumed chain: page 1 @ saved block 20, short
    writeTx(dump, t, w, tok, 20, 1, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(25, "0xn1")}]}""")
    val (rA, rB, rowsA, rowsB, curA, curB) =
      bothTxPaths(dump, w, tok, pageSize = 2, seedCursor = Some((20L, 1)))
    assert(rA.rows == 1 && rA.lastBlock == 25)
    assert((rB.rows, rB.lastBlock) == ((rA.rows, rA.lastBlock)))
    assert(rowsA == rowsB && curA == curB)
    assert(!rowsB.exists(_.exists(v => v != null && v.toString.contains("OLD"))))
  }

  test("dump dirs resolve through the Hadoop FileSystem API: an explicit file: URI reads identically") {
    val (dump, t) = freshFixtures()
    val token = "0xuri"
    write(dump, t, token, 1, 2, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "100")}]}""".stripMargin)
    def rows(dir: String) = spark.read.format("merlin")
      .option("dir", dir).option("contractaddress", token).option("pagesize", 2)
      .load().select("page", "idx", "holder_address", "quantity_raw")
      .collect().map(_.toSeq).toSeq
    val plain = rows(dump)
    val uri = rows("file:" + dump)
    assert(plain.nonEmpty && plain == uri,
      "a scheme-qualified Hadoop URI must read byte-identically to the bare path")
  }

  test("pushed filters drop rows inside the scan; rejected predicates stay post-scan") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val (dump, t) = freshFixtures()
    val token = "0xpf"
    write(dump, t, token, 1, 3, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "100")}, ${item("0xA2", "200", Some(8))},
      |{"TokenHolderAddress":"0xNOQ"}]}""".stripMargin)
    write(dump, t, token, 2, 3, s"""{"status":"1","message":"OK","result":[
      |${item("0xB1", "300")}, ${item("0xA1", "999")}, ${item("0xB3", "500")}]}""".stripMargin)
    val raw = spark.read.format("merlin")
      .option("dir", dump).option("contractaddress", token)
      .option("pagesize", 3).load()

    def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec => b }.get

    // address equality: only matching items materialize rows
    val q = raw.filter(col("holder_address") === "0xA1")
      .select("page", "quantity_raw")
    assert(q.collect().map(_.getString(1)).sorted.toSeq == Seq("100", "999"))
    val scan = scanOf(q)
    assert(scan.scan.description().contains("holder_address = 0xA1"),
      s"push not advertised: ${scan.scan.description()}")
    assert(scan.metrics("numOutputRows").value == 2,
      "scan must emit ONLY the matching rows, not filter them post-scan")

    // non-null push: the no-quantity item drops at the source
    val qn = raw.filter(col("quantity_raw").isNotNull)
    assert(qn.collect().length == 5)
    assert(scanOf(qn).metrics("numOutputRows").value == 5)

    // a predicate on an int column is rejected → correct post-scan
    val qr = raw.filter(col("decimals_obs") === 8)
    assert(qr.collect().map(_.getAs[String]("holder_address")).toSeq == Seq("0xA2"))
    assert(scanOf(qr).scan.description().contains("pushed=[]"))

    // tokentx mode: from_address equality prunes at the source too
    val (w, tk) = ("0xWp", "0xTp")
    writeTx(dump, t, w, tk, 0, 1, 2,
      s"""{"status":"1","message":"OK","result":[${txItem(10, "0xp1")},${txItem(20, "0xp2")}]}""")
    val rawTx = spark.read.format("merlin")
      .option("mode", "tokentx").option("dir", dump)
      .option("address", w).option("contractaddress", tk)
      .option("pagesize", 2).load()
    val qt = rawTx.filter(col("from_address") === "0xF10").select("tx_hash")
    assert(qt.collect().map(_.getString(0)).toSeq == Seq("0xp1"))
    assert(scanOf(qt).metrics("numOutputRows").value == 1)
  }

  test("scan is partition-parallel and column-pruned") {
    val (dump, t) = freshFixtures()
    val token = "0xbig"
    // 12 full pages + 1 short page
    for (p <- 1 to 13) {
      val n = if (p == 13) 1 else 4
      val items = (1 to n).map(i => item(s"0xh${p}_$i", s"${p * 100 + i}")).mkString(",")
      write(dump, t, token, p, 4, s"""{"status":"1","message":"OK","result":[$items]}""")
    }
    val raw = spark.read.format("merlin")
      .option("dir", dump).option("contractaddress", token)
      .option("pagesize", 4).option("pagesperpartition", 3).load()
    // 13 pages at 3 pages/partition → 5 input partitions
    assert(raw.rdd.getNumPartitions == 5)
    assert(raw.count() == 49)

    // column pruning pushed into the scan: a page-only projection's
    // BatchScan must output ONLY the page column (DSv2 prints the
    // scan's output attrs in brackets)
    val plan = raw.select("page").queryExecution.executedPlan.toString
    val scanOut = "BatchScan [^\\[]*\\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(scanOut.matches("page#\\d+"),
      s"expected scan pruned to page only, scan output was [$scanOut] in:\n$plan")

    // short-name registration via META-INF/services works end-to-end
    // (already exercised above); equivalence at this size too
    val (rA, rB, rowsA, rowsB) = bothPaths(dump, token, pageSize = 4,
      pagesPerPartition = 3)
    assert(rA.rows == 49 && rA.pages == 13)
    assert((rB.rows, rB.pages) == ((rA.rows, rA.pages)) && rowsA == rowsB)
  }
}
