package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSource V2 connector: a deterministic synthetic "documents"
  * generator with REAL pushdown — `id` range predicates narrow the
  * generated span before partition planning (empty splits are never even
  * scheduled), and column pruning drops generation work for unread
  * columns. The point is the ENGINE surface: this is the connector shape
  * (TableProvider → Table → ScanBuilder with pushdown → Batch →
  * PartitionReader) any external system (a feature store, a crawl
  * frontier, an object-store manifest) plugs into Spark with — and the
  * V2SourceSpec proves the planner actually consumed the pushdown
  * (partition count shrinks, filters leave the post-scan plan).
  *
  * Usage: spark.read.format("graft.sources.v2.RangeDocsProvider")
  *   .option("numRows", …).option("numPartitions", …).load()
  */
class RangeDocsProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeDocs.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RangeDocsTable(
      properties.getOrDefault("numRows", "1000").toLong,
      properties.getOrDefault("numPartitions", "8").toInt)
}

object RangeDocs {
  val Schema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("bucket", LongType, nullable = false)
    .add("text", StringType, nullable = false)
}

class RangeDocsTable(numRows: Long, numPartitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_range($numRows)"
  override def schema(): StructType = RangeDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeDocsScanBuilder(numRows, numPartitions,
      options.getLong("rowsPerBatch", 100L))
}

/** Pushdown state: [lo, hi) narrows as `id` predicates arrive; pruned
  * columns drop out of the read schema. */
class RangeDocsScanBuilder(numRows: Long, numPartitions: Int,
                           rowsPerBatch: Long = 100L)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = numRows
  private var pushed = Array.empty[Filter]
  private var readSchema: StructType = RangeDocs.Schema

  // literals surface as Int or Long depending on how the predicate was
  // written — accept any integral numeric
  private object L {
    def unapply(v: Any): Option[Long] = v match {
      case n: Number => Some(n.longValue())
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", L(v)) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", L(v)) => lo = math.max(lo, v); true
      case LessThan("id", L(v)) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", L(v)) => hi = math.min(hi, v + 1); true
      case EqualTo("id", L(v)) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected // everything else stays a post-scan Filter
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    readSchema = requiredSchema

  override def build(): Scan =
    new RangeDocsScan(lo, hi, numRows, numPartitions, rowsPerBatch, readSchema)
}

class RangeDocsScan(lo: Long, hi: Long, numRows: Long, numPartitions: Int,
                    rowsPerBatch: Long, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeDocsMicroBatch(numRows, rowsPerBatch, schema)
  override def description(): String =
    s"RangeDocs [lo=$lo, hi=$hi, cols=${schema.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // fixed split WIDTH anchored to the UNFILTERED table (the analogue
    // of a file/partition layout on disk): narrowing [lo, hi) skips
    // whole splits, so pushdown visibly shrinks the partition count —
    // exactly how partition pruning behaves over real storage
    val width = math.max(numRows / numPartitions, 1L)
    if (hi <= lo) Array.empty
    else {
      val first = lo / width
      val last = (hi - 1) / width
      (first to last).iterator
        .map(i => RangeDocsPartition(
          math.max(lo, i * width), math.min(hi, (i + 1) * width)): InputPartition)
        .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeDocsReaderFactory(schema)
}

case class RangeDocsPartition(start: Long, end: Long) extends InputPartition

/** Offset = highest row id produced so far. Restart-safe: the offset is
  * the single source of truth, so a checkpointed restart resumes at the
  * committed row — the connector itself is stateless. */
case class RangeDocsOffset(exclusiveEnd: Long) extends Offset {
  override def json(): String = exclusiveEnd.toString
}

/** Micro-batch face of the same relation with REAL admission control:
  * each trigger admits at most `rowsPerBatch` rows (the connector-side
  * rate limit, like maxFilesPerTrigger), so the table drains across
  * several offset-bounded batches instead of one giant one. */
class RangeDocsMicroBatch(numRows: Long, rowsPerBatch: Long,
                          schema: StructType)
  extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = RangeDocsOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RangeDocsOffset].exclusiveEnd
    RangeDocsOffset(math.min(s + rowsPerBatch, numRows))
  }
  override def reportLatestOffset(): Offset = RangeDocsOffset(numRows)
  override def deserializeOffset(json: String): Offset =
    RangeDocsOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RangeDocsOffset].exclusiveEnd
    val e = end.asInstanceOf[RangeDocsOffset].exclusiveEnd
    if (e <= s) Array.empty
    else (s until e by rowsPerBatch)
      .map(b => RangeDocsPartition(b, math.min(b + rowsPerBatch, e)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeDocsReaderFactory(schema)
}

class RangeDocsReaderFactory(schema: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeDocsPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values = schema.fieldNames.map {
          case "id" => cur
          case "bucket" => cur % 97L
          case "text" => UTF8String.fromString(s"doc-$cur")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
