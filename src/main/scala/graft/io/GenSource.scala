package graft.io

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 deterministic row generator — the engine's custom
  * CONNECTOR surface (every other source here rides Spark's built-in
  * file formats; this one implements the V2 contract itself, the API
  * a proprietary store/index would plug in through at 100 TB).
  *
  * `spark.read.format("graftgen").option("rows", n).option("parts", p)`
  * yields rows id ∈ [0, n) with deterministic derived columns (exact
  * integer arithmetic, so a DuckDB `generate_series` oracle can mirror
  * every value bit-for-bit):
  *
  *   grp = id % 97
  *   v   = (id * 48271) % 2147483647   (Lehmer step, overflow-free
  *                                      for id < ~1.9e14)
  *   tag = 't' || (id % 7)
  *
  * What makes it a REAL connector and not a toy:
  *  - SupportsPushDownRequiredColumns: the reader materializes only
  *    the pruned schema (a projection never touches unread columns —
  *    the DSv2 equivalent of parquet column pruning).
  *  - SupportsPushDownFilters: range predicates on `id` (=, <, <=, >,
  *    >=) are absorbed into a [lo, hi) bound, reported as pushed, and
  *    — the part that matters at scale — used to SKIP whole input
  *    partitions whose id range cannot match, exactly how file-stat /
  *    partition pruning skips parquet files. Filters on other columns
  *    are left as residuals for Spark to evaluate.
  *  - planInputPartitions splits [0, rows) into `parts` contiguous
  *    ranges — the unit of parallelism a 1000-executor cluster
  *    schedules; GenSourceSpec pins that a bounded query plans fewer
  *    partitions than an unbounded one.
  */
class GenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftgen"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("parts")).map(_.toInt).getOrElse(8)
    new GenTable(rows, math.max(parts, 1))
  }
}

object GenSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

private[io] class GenTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graftgen($rows)"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, parts)
}

private[io] class GenScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = GenSource.schema
  private var pushed: Array[Filter] = Array.empty

  /** A filter is absorbable iff it tightens the [lo, hi) id bound.
    * The +1 conversions to half-open bounds saturate instead of
    * wrapping: `id <= Long.MaxValue` must absorb as the full range,
    * not overflow to an empty one (and `id > Long.MaxValue` as the
    * empty range, not the full one) — a pushed filter is REMOVED from
    * Spark's residual set, so a wrong bound is a silent wrong answer. */
  private def inc(x: Long): Long =
    if (x == Long.MaxValue) Long.MaxValue else x + 1
  private def bound(f: Filter): Option[(Long, Long)] = f match {
    case EqualTo("id", x: Long) =>
      Some((x, inc(x))) // degenerate-empty only at MaxValue, matching ==
    case GreaterThan("id", x: Long) =>
      if (x == Long.MaxValue) Some((Long.MaxValue, Long.MaxValue)) // empty
      else Some((x + 1, Long.MaxValue))
    case GreaterThanOrEqual("id", x: Long) => Some((x, Long.MaxValue))
    case LessThan("id", x: Long) => Some((Long.MinValue, x))
    case LessThanOrEqual("id", x: Long) => Some((Long.MinValue, inc(x)))
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition(bound(_).isDefined)
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val (lo, hi) = pushed.flatMap(bound).foldLeft((0L, rows)) {
      case ((l, h), (fl, fh)) => (math.max(l, fl), math.min(h, fh))
    }
    new GenScan(rows, parts, lo, hi, required)
  }
}

/** One contiguous id range; the scan skips ranges outside [lo, hi). */
private[io] case class GenRange(start: Long, end: Long) extends InputPartition

private[io] class GenScan(rows: Long, parts: Int, lo: Long, hi: Long,
                          required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => GenRange(i * per, math.min((i + 1) * per, rows)))
      // partition-range pruning: the pushed id bound skips whole
      // ranges, the DSv2 analogue of parquet file skipping
      .filter(r => r.start < r.end && r.end > lo && r.start < hi)
      .map(r => GenRange(math.max(r.start, lo), math.min(r.end, hi)))
      .map(_.asInstanceOf[InputPartition])
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenReaderFactory(required.fieldNames)

  override def description(): String =
    s"graftgen rows=$rows parts=$parts bounds=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"
}

private[io] class GenReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[GenRange]
    new PartitionReader[InternalRow] {
      private var id = r.start - 1
      override def next(): Boolean = { id += 1; id < r.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "id" => id
          case "grp" => id % 97L
          case "v" => (id * 48271L) % 2147483647L
          case "tag" => UTF8String.fromString("t" + (id % 7L))
        })
      override def close(): Unit = ()
    }
  }
}
