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

  test("empty dump and missing-first-page dump produce empty state on both paths") {
    val (dump, t) = freshFixtures()
    val token = "0xnone"
    // page 2 exists but page 1 doesn't → contiguous prefix is empty
    write(dump, t, token, 2, 2, s"""{"status":"1","message":"OK","result":[
      |${item("0xA1", "1")}]}""".stripMargin)
    val (rA, rB, rowsA, rowsB) = bothPaths(dump, token, pageSize = 2)
    assert(rA.rows == 0 && rB.rows == 0 && rowsA.isEmpty && rowsB.isEmpty)
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
