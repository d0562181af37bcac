package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Partition-parallel DSv2 reader for dumped explorer pages — the
  * "v2 evolution" of the driver-side ingest (SURVEY S1/S6;
  * `merlin_etl.py:87-101,346-479`). The live API is rate-limited to
  * ~3 QPS, so the online page loop is driver-side by design; this
  * source covers the case the driver loop cannot: a bulk/offline
  * BACKFILL over a directory of dumped JSON pages (the
  * [[FileTransport]] layout), where there is no rate limit and the
  * read should scale with the cluster, not with one driver thread.
  *
  * Two modes (`mode` option):
  *
  *  - `holders` (default): `token.tokenholderlist` pages. Page N's
  *    filename is a pure function of (token, N, pageSize), so the
  *    planner enumerates the contiguous page prefix `1..K` directly
  *    from ONE directory listing and splits it into page-range
  *    partitions.
  *  - `tokentx`: `account.tokentx` pages. Page N+1's filename embeds
  *    the RUNNING max block of pages `1..N` (the loop's resume
  *    cursor), so filenames depend on page CONTENTS and a prefix walk
  *    is impossible without reading data. The planner instead lists
  *    ALL candidate files for (wallet, token, pageSize) by name
  *    pattern — any page, any startblock — and partitions them for
  *    parallel parsing; [[graft.pipelines.Ingest.walletTokenTxParallel]]
  *    replays the chain over a per-page metadata aggregate (count +
  *    max block per file — planning-scale, not data-scale) to decide
  *    which files the sequential loop would actually have fetched.
  *    Stale files from older runs parse speculatively and are
  *    filtered by the replay — bounded waste, never wrong rows.
  *
  * All filesystem access goes through the Hadoop FileSystem API
  * ([[HadoopTransport]] / `listStatus`), so the dump dir may live on
  * `file:`, `hdfs:` or `s3a:` — the layouts a real backfill uses —
  * not only a shared POSIX mount.
  *
  * Column pruning is pushed down ([[SupportsPushDownRequiredColumns]]):
  * a count-only pass over the dump reads no string columns.
  *
  * Termination (`status != "1"` / empty / short page) and the other
  * order-dependent loop pieces (sticky decimals, running cursor) stay
  * OUT of the parallel reader — see
  * [[graft.pipelines.Ingest.holdersSnapshotParallel]] and
  * [[graft.pipelines.Ingest.walletTokenTxParallel]] for the replay
  * equivalence arguments.
  */
class MerlinSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "merlin"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MerlinOptions(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MerlinTable(MerlinOptions(new CaseInsensitiveStringMap(properties)))
}

object MerlinSource {
  /** `holders` mode: one row per raw envelope item. `idx` is the
    * item's position within its page (the loop's processing order),
    * `decimals_obs` the raw observed decimals field (null when the
    * item carries none).
    */
  val HolderSchema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("holder_address", StringType),
    StructField("quantity_raw", StringType),
    StructField("decimals_obs", IntegerType)))

  /** `tokentx` mode: one row per raw envelope item, every API field as
    * the raw STRING the envelope carried (parsing happens downstream
    * in DataFrame expressions, mirroring the sequential loop's
    * parse-with-default semantics). `start_block` is the file's
    * `startblock` request param — the chain-replay key.
    */
  val TokenTxSchema: StructType = StructType(
    Seq(
      StructField("page", IntegerType, nullable = false),
      StructField("start_block", LongType, nullable = false),
      StructField("idx", IntegerType, nullable = false)) ++
      TxFields.Keys.map { case (name, _) => StructField(name, StringType) })
}

final case class MerlinOptions(mode: String, dir: String, token: String,
                               wallet: String, pageSize: Int,
                               maxPages: Int, pagesPerPartition: Int) {
  def schema: StructType =
    if (mode == "tokentx") MerlinSource.TokenTxSchema else MerlinSource.HolderSchema
}

object MerlinOptions {
  def apply(o: CaseInsensitiveStringMap): MerlinOptions = {
    require(o.containsKey("dir"), "merlin source requires option 'dir'")
    require(o.containsKey("contractaddress"), "merlin source requires option 'contractaddress'")
    val mode = Option(o.get("mode")).getOrElse("holders").toLowerCase
    require(mode == "holders" || mode == "tokentx",
      s"merlin source mode must be 'holders' or 'tokentx', got '$mode'")
    require(mode != "tokentx" || o.containsKey("address"),
      "merlin tokentx mode requires option 'address' (the wallet)")
    MerlinOptions(mode, o.get("dir"), o.get("contractaddress"),
      Option(o.get("address")).getOrElse(""),
      o.getInt("pagesize", 100), o.getInt("maxpages", 10000),
      math.max(o.getInt("pagesperpartition", 8), 1))
  }
}

class MerlinTable(opts: MerlinOptions) extends Table with SupportsRead {
  override def name(): String = s"merlin(${opts.mode}, ${opts.dir}, ${opts.token})"
  override def schema(): StructType = opts.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MerlinScanBuilder(opts)
}

class MerlinScanBuilder(opts: MerlinOptions)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
  private var required: StructType = opts.schema
  private var pushed: Array[Filter] = Array.empty

  /** Fields whose raw item value the readers can test without building
    * a row: every string-valued envelope field. Position/int columns
    * (page/idx/start_block/decimals_obs) stay post-scan.
    */
  private def stringFields: Set[String] =
    if (opts.mode == "tokentx") TxFields.Keys.map(_._1).toSet
    else Set("holder_address", "quantity_raw")

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of our schema (possibly empty for
    // pure counts); keep our canonical field order for the reader.
    required = StructType(
      opts.schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  /** Cheap per-item predicates (address equality, non-null) evaluate
    * during page parsing, before any row is materialized — the
    * filtered-out items never deserialize past the envelope map.
    * Accepted filters are FULLY applied at the source (matching rows
    * only), so just the rejected remainder stays post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => stringFields.contains(a)
      case IsNotNull(a) => stringFields.contains(a)
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new MerlinScan(opts, required, pushed.toSeq.collect {
    case EqualTo(a, v: String) => a -> Some(v)
    case IsNotNull(a) => a -> None
  })
}

class MerlinScan(opts: MerlinOptions, required: StructType,
                 preds: Seq[(String, Option[String])]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val p = preds.map { case (f, Some(v)) => s"$f = $v"
                        case (f, None) => s"$f IS NOT NULL" }.mkString(", ")
    s"merlin ${opts.mode} pages: dir=${opts.dir} token=${opts.token} " +
      s"pageSize=${opts.pageSize}, pushed=[$p]"
  }

  /** ONE `listStatus` on the dump dir (driver-side; any Hadoop
    * filesystem) — no file contents are read during planning.
    */
  private def listNames(): Set[String] = {
    val path = new org.apache.hadoop.fs.Path(opts.dir)
    val conf = SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    try path.getFileSystem(conf).listStatus(path).map(_.getPath.getName).toSet
    catch { case _: java.io.FileNotFoundException => Set.empty }
  }

  override def planInputPartitions(): Array[InputPartition] =
    if (opts.mode == "tokentx") planTokenTx() else planHolders()

  /** Contiguous page prefix 1..K present in the dump, capped at
    * maxPages, chunked into page-range partitions. A dump whose page 1
    * is MISSING while later pages for the same token exist cannot have
    * been produced by the sequential loop (which always starts at
    * page 1) — fail fast on the corrupt/partial dump instead of
    * silently ingesting nothing.
    */
  private def planHolders(): Array[InputPartition] = {
    val names = listNames()
    def pageName(p: Int): String =
      FileTransport.name(HolderFields.pageParams(opts.token, p, opts.pageSize))
    var k = 0
    while (k < opts.maxPages && names.contains(pageName(k + 1))) k += 1
    if (k == 0) {
      // `page` sorts last in the param string, so the page-0 name
      // minus its "0.json" tail is the shared prefix of every page of
      // this (token, pageSize) dump.
      val prefix = pageName(0).stripSuffix("0.json")
      require(!names.exists(_.startsWith(prefix)),
        s"merlin dump at ${opts.dir} has holder pages for ${opts.token} but no page 1 — " +
          "partial or corrupt dump (the sequential loop always writes page 1 first)")
    }
    (1 to k).grouped(opts.pagesPerPartition)
      .map(r => MerlinPartition(r.head, r.last): InputPartition).toArray
  }

  /** Every candidate tokentx file for (wallet, token, pageSize),
    * parsed as (page, startblock) out of the filename — the chain walk
    * over contents happens downstream over per-page metadata.
    */
  private def planTokenTx(): Array[InputPartition] = {
    val marker = FileTransport.name(
      TxFields.pageParams(opts.wallet, opts.token, 0L, 0, opts.pageSize))
    val prefix = marker.stripSuffix("page=0&sort=asc&startblock=0.json")
    val rx = (java.util.regex.Pattern.quote(prefix) +
      "page=(\\d+)&sort=asc&startblock=(\\d+)\\.json").r
    val files = listNames().toSeq.flatMap {
      case rx(p, s) => Some((p.toInt, s.toLong))
      case _ => None
    }.sorted
    files.grouped(opts.pagesPerPartition)
      .map(g => MerlinTxPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MerlinReaderFactory(opts, required.fieldNames, preds)
}

final case class MerlinPartition(firstPage: Int, lastPage: Int) extends InputPartition
final case class MerlinTxPartition(pages: Seq[(Int, Long)]) extends InputPartition

class MerlinReaderFactory(opts: MerlinOptions, fields: Array[String],
                          preds: Seq[(String, Option[String])])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: MerlinPartition => new MerlinPageReader(opts, fields, preds, p)
      case p: MerlinTxPartition => new MerlinTxPageReader(opts, fields, preds, p)
    }
}

/** Pushed-filter evaluation over a raw envelope item: every predicate
  * must hold on the item's coalesced string value.
  */
private object MerlinPredicates {
  def ok(preds: Seq[(String, Option[String])],
         valueOf: String => Option[String]): Boolean =
    preds.forall {
      case (f, None) => valueOf(f).isDefined
      case (f, Some(v)) => valueOf(f).contains(v)
    }
}

/** Executor-side holder-page reader: parses each page in its range
  * through [[ExplorerClient]] (constructed here — transports are not
  * serialized) and emits raw items projected to the pruned schema.
  * Pages that are `!ok` or empty contribute no rows; the downstream
  * cutoff logic recognizes that as the loop's termination point.
  */
class MerlinPageReader(opts: MerlinOptions, fields: Array[String],
                       preds: Seq[(String, Option[String])], part: MerlinPartition)
  extends PartitionReader[InternalRow] {

  private val client = new ExplorerClient(new HadoopTransport(opts.dir))
  private var page = part.firstPage - 1
  private var items: IndexedSeq[Map[String, String]] = IndexedSeq.empty
  private var idx = 0
  private var row: InternalRow = _

  private def valueOf(it: Map[String, String])(f: String): Option[String] = f match {
    case "holder_address" => HolderFields.addr(it)
    case "quantity_raw" => HolderFields.qty(it)
    case _ => None
  }

  override def next(): Boolean = {
    while (true) {
      while (idx >= items.size) {
        if (page >= part.lastPage) return false
        page += 1
        val env = client.holderPage(opts.token, page, opts.pageSize)
        items = if (env.ok) env.resultItems.toIndexedSeq else IndexedSeq.empty
        idx = 0
      }
      val it = items(idx)
      if (MerlinPredicates.ok(preds, valueOf(it))) {
        def utf8(v: Option[String]): Any = v.map(UTF8String.fromString).orNull
        val values: Array[Any] = fields.map {
          case "page" => page
          case "idx" => idx
          case "holder_address" => utf8(HolderFields.addr(it))
          case "quantity_raw" => utf8(HolderFields.qty(it))
          case "decimals_obs" => HolderFields.dec(it).map(Int.box).orNull
        }
        row = new GenericInternalRow(values)
        idx += 1
        return true
      }
      idx += 1
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

/** Executor-side tokentx-page reader: each (page, startblock) file in
  * the partition parses through [[ExplorerClient]] and emits one row
  * per raw item with every field as its raw string. `!ok`/empty files
  * contribute no rows — the chain replay treats the absence as the
  * loop's termination probe.
  */
class MerlinTxPageReader(opts: MerlinOptions, fields: Array[String],
                         preds: Seq[(String, Option[String])], part: MerlinTxPartition)
  extends PartitionReader[InternalRow] {

  private val client = new ExplorerClient(new HadoopTransport(opts.dir))
  private val keyOf = TxFields.Keys.toMap
  private var remaining = part.pages
  private var page = 0
  private var startBlock = 0L
  private var items: IndexedSeq[Map[String, String]] = IndexedSeq.empty
  private var idx = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      while (idx >= items.size) {
        remaining match {
          case (p, s) +: rest =>
            remaining = rest
            page = p
            startBlock = s
            val env = client.tokenTxPage(opts.wallet, opts.token, s, p, opts.pageSize)
            items = if (env.ok) env.resultItems.toIndexedSeq else IndexedSeq.empty
            idx = 0
          case _ => return false
        }
      }
      val it = items(idx)
      if (MerlinPredicates.ok(preds, f => keyOf.get(f).flatMap(it.get))) {
        val values: Array[Any] = fields.map {
          case "page" => page
          case "start_block" => startBlock
          case "idx" => idx
          case f => it.get(keyOf(f)).map(UTF8String.fromString).orNull
        }
        row = new GenericInternalRow(values)
        idx += 1
        return true
      }
      idx += 1
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
