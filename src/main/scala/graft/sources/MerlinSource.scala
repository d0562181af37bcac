package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Partition-parallel DSv2 reader for dumped explorer holder pages —
  * the "v2 evolution" of the driver-side ingest (SURVEY S1;
  * `merlin_etl.py:87-101`). The live API is rate-limited to ~3 QPS, so
  * the online page loop is driver-side by design; this source covers
  * the case the driver loop cannot: a bulk/offline BACKFILL over a
  * directory of dumped JSON pages (the [[FileTransport]] layout),
  * where there is no rate limit and the read should scale with the
  * cluster, not with one driver thread.
  *
  * Layout of the scan:
  *  - `planInputPartitions` probes the dump directory for the
  *    contiguous page prefix `1..K` (filename existence only — no
  *    file contents are read on the driver) and splits it into
  *    [[MerlinPartition]] page ranges of `pagesPerPartition`.
  *  - Each [[MerlinPageReader]] re-parses its pages through the SAME
  *    [[ExplorerClient]] + [[HolderFields]] coalescing as the online
  *    loop, emitting one row per RAW envelope item — including items
  *    the pipeline later null-drops — so downstream termination logic
  *    (short page = raw item count < pageSize) sees exactly what the
  *    sequential loop saw.
  *  - Column pruning is pushed down ([[SupportsPushDownRequiredColumns]]):
  *    a count-only pass over the dump reads no string columns.
  *
  * Termination (`status != "1"` / empty / short page) and sticky
  * decimals are ORDER-dependent, so they stay out of the parallel
  * reader: [[graft.pipelines.Ingest.holdersSnapshotParallel]] applies
  * them from per-page metadata (a tiny aggregate) — see there for the
  * exact-equivalence argument vs the sequential loop.
  *
  * Schema: `page INT, idx INT, holder_address STRING, quantity_raw
  * STRING, decimals_obs INT` — `idx` is the item's position within its
  * page (the loop's processing order), `decimals_obs` the raw observed
  * decimals field (null when the item carries none).
  */
class MerlinSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "merlin"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MerlinSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MerlinTable(MerlinOptions(new CaseInsensitiveStringMap(properties)))
}

object MerlinSource {
  val Schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("idx", IntegerType, nullable = false),
    StructField("holder_address", StringType),
    StructField("quantity_raw", StringType),
    StructField("decimals_obs", IntegerType)))
}

final case class MerlinOptions(dir: String, token: String, pageSize: Int,
                               maxPages: Int, pagesPerPartition: Int)

object MerlinOptions {
  def apply(o: CaseInsensitiveStringMap): MerlinOptions = {
    require(o.containsKey("dir"), "merlin source requires option 'dir'")
    require(o.containsKey("contractaddress"), "merlin source requires option 'contractaddress'")
    MerlinOptions(o.get("dir"), o.get("contractaddress"),
      o.getInt("pagesize", 100), o.getInt("maxpages", 10000),
      math.max(o.getInt("pagesperpartition", 8), 1))
  }
}

class MerlinTable(opts: MerlinOptions) extends Table with SupportsRead {
  override def name(): String = s"merlin(${opts.dir}, ${opts.token})"
  override def schema(): StructType = MerlinSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MerlinScanBuilder(opts)
}

class MerlinScanBuilder(opts: MerlinOptions)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MerlinSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of our schema (possibly empty for
    // pure counts); keep our canonical field order for the reader.
    required = StructType(
      MerlinSource.Schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new MerlinScan(opts, required)
}

class MerlinScan(opts: MerlinOptions, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"merlin holder pages: dir=${opts.dir} token=${opts.token} pageSize=${opts.pageSize}"

  /** Contiguous page prefix 1..K present in the dump (existence probes
    * only — O(K) local stat calls, no content reads on the driver),
    * capped at maxPages, chunked into page-range partitions.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val t = new FileTransport(opts.dir)
    var k = 0
    while (k < opts.maxPages && java.nio.file.Files.exists(java.nio.file.Paths.get(
      opts.dir, t.fixtureName(HolderFields.pageParams(opts.token, k + 1, opts.pageSize)))))
      k += 1
    (1 to k).grouped(opts.pagesPerPartition)
      .map(r => MerlinPartition(r.head, r.last): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MerlinReaderFactory(opts, required.fieldNames)
}

final case class MerlinPartition(firstPage: Int, lastPage: Int) extends InputPartition

class MerlinReaderFactory(opts: MerlinOptions, fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MerlinPageReader(opts, fields, partition.asInstanceOf[MerlinPartition])
}

/** Executor-side reader: parses each page in its range through
  * [[ExplorerClient]] (constructed here — transports are not
  * serialized) and emits raw items projected to the pruned schema.
  * Pages that are `!ok` or empty contribute no rows; the downstream
  * cutoff logic recognizes that as the loop's termination point.
  */
class MerlinPageReader(opts: MerlinOptions, fields: Array[String], part: MerlinPartition)
  extends PartitionReader[InternalRow] {

  private val client = new ExplorerClient(new FileTransport(opts.dir))
  private var page = part.firstPage - 1
  private var items: Seq[Map[String, String]] = Nil
  private var idx = 0
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (idx >= items.size) {
      if (page >= part.lastPage) return false
      page += 1
      val env = client.holderPage(opts.token, page, opts.pageSize)
      items = if (env.ok) env.resultItems else Nil
      idx = 0
    }
    val it = items(idx)
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
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
