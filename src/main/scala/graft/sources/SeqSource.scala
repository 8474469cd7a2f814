package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A minimal DataSource V2 TableProvider — the extension seam a
  * 100 TB deployment uses to mount bespoke storage (feature stores,
  * internal record formats) as first-class Spark tables, with the two
  * pushdowns that make custom sources viable at scale:
  *
  *   - '''filter pushdown''' ([[SupportsPushDownFilters]]): range
  *     predicates on `id` shrink the planned input partitions — the
  *     source-side analog of parquet row-group skipping, visible in
  *     the scan description and pinned in SeqSourceSpec;
  *   - '''column pruning''' ([[SupportsPushDownRequiredColumns]]):
  *     readers materialize only the projected fields.
  *
  * The table itself is a deterministic synthetic sequence
  * (`id ∈ [0, n)`, `sq = (id·id) mod 97`, `tag = id mod 7` as text)
  * so every query over it is DuckDB-replayable via `range(n)` — the
  * custom-source path runs under the same hash gate as every other
  * operator (q231).
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  * .option("n", …).option("parts", …).load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.asScala.getOrElse("n", "1000").toLong,
      properties.asScala.getOrElse("parts", "8").toInt)
}

object SeqSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  /** Test hook: how many partitions the LAST scan actually planned
    * after range pruning (single-JVM; good enough for the spec pin). */
  @volatile var lastPlannedPartitions: Int = -1
}

private[sources] class SeqTable(n: Long, parts: Int)
  extends Table with SupportsRead {
  override def name(): String = s"graft_seq($n)"
  override def schema(): StructType = SeqSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(n, parts)
}

private[sources] class SeqScanBuilder(n: Long, parts: Int)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo = 0L
  private var hi = n - 1
  private var pushed = Array.empty[Filter]
  private var required: StructType = SeqSource.Schema
  private var aggResult: Option[(StructType, Array[Long])] = None

  // ---- aggregate pushdown (SupportsPushDownAggregates) ----
  // COUNT(*) / MIN(id) / MAX(id) with no GROUP BY are CLOSED-FORM
  // over the filter-pruned range [lo, hi] — the source answers them
  // from arithmetic, scanning nothing: the DSv2 seam a warehouse-
  // style source uses to serve metadata-only aggregates (parquet
  // footer counts, index min/max) without reading a single row.
  // Complete pushdown: Spark plans NO aggregate node at all — the
  // scan IS the one result row (pinned in PlanAuditSpec).
  private def isIdRef(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference =>
        r.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  private def prunedCount: Long =
    math.max(0L, math.min(hi, n - 1) - math.max(lo, 0L) + 1)

  private def canPush(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    : Boolean =
    agg.groupByExpressions.isEmpty && prunedCount > 0 &&
      agg.aggregateExpressions.forall {
        case _: org.apache.spark.sql.connector.expressions.aggregate.CountStar => true
        case m: org.apache.spark.sql.connector.expressions.aggregate.Min =>
          isIdRef(m.column)
        case m: org.apache.spark.sql.connector.expressions.aggregate.Max =>
          isIdRef(m.column)
        case _ => false
      }

  // ---- limit / top-N pushdown ----
  // LIMIT over the id-ordered sequence is closed-form range
  // shrinking: ascending k = [lo, lo+k-1], descending k =
  // [hi-k+1, hi]. Only offered when EVERY filter was pushed (a
  // residual filter runs after the scan, so a scan-side limit would
  // under-produce); bare LIMIT is fully absorbed
  // (isPartiallyPushed = false → Spark plans no Limit node), top-N
  // stays partial so Spark still orders the ≤k survivors.
  private var residualFilters = false
  private var limitFully = false

  override def pushLimit(limit: Int): Boolean = {
    if (residualFilters || prunedCount == 0) return false
    hi = math.min(hi, math.max(lo, 0L) + limit - 1)
    limitFully = true
    true
  }
  override def isPartiallyPushed(): Boolean = !limitFully

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    if (residualFilters || prunedCount == 0) return false
    if (orders.length != 1 || !isIdRef(orders(0).expression)) return false
    orders(0).direction match {
      case org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING =>
        hi = math.min(hi, math.max(lo, 0L) + limit - 1)
      case org.apache.spark.sql.connector.expressions.SortDirection.DESCENDING =>
        lo = math.max(lo, math.min(hi, n - 1) - limit + 1)
    }
    true // partial: Spark re-orders the ≤ limit survivors
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    : Boolean = canPush(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    : Boolean = {
    if (!canPush(agg)) return false
    val cols = agg.aggregateExpressions.map {
      case _: org.apache.spark.sql.connector.expressions.aggregate.CountStar =>
        ("count(*)", prunedCount)
      case _: org.apache.spark.sql.connector.expressions.aggregate.Min =>
        ("min(id)", math.max(lo, 0L))
      case _: org.apache.spark.sql.connector.expressions.aggregate.Max =>
        ("max(id)", math.min(hi, n - 1))
      case other => sys.error(s"unreachable: $other")
    }
    aggResult = Some((
      StructType(cols.map { case (nm, _) =>
        StructField(nm, LongType, nullable = false) }),
      cols.map(_._2)))
    true
  }

  /** Accept conjunctive range/equality atoms on `id`; everything else
    * stays post-scan (returned as unsupported). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case GreaterThan("id", _: Long) => true
      case GreaterThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case EqualTo("id", _: Long) => true
      case _ => false
    }
    ours.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ => ()
    }
    pushed = ours
    residualFilters = rest.nonEmpty
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggResult match {
    case Some((schema, values)) => new SeqAggScan(schema, values)
    case None => new SeqScan(n, parts, lo, hi, required)
  }
}

/** The completely-pushed-down aggregate: one partition, one row,
  * computed from range arithmetic — no sequence materialization. */
private[sources] class SeqAggScan(schema: StructType,
                                  values: Array[Long])
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq AGG-PUSHED ${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqAggReaderFactory(values)
}

private[sources] class SeqAggReaderFactory(values: Array[Long])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean =
        if (emitted) false else { emitted = true; true }
      override def get(): InternalRow =
        InternalRow.fromSeq(values.toIndexedSeq)
      override def close(): Unit = ()
    }
}

private[sources] class SeqScan(n: Long, parts: Int, lo: Long, hi: Long,
                               required: StructType)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // ---- runtime filtering (SupportsRuntimeFiltering) ----
  // The DSv2 face of dynamic partition pruning: when this scan sits
  // on the probe side of a broadcast join, Spark hands the build
  // side's join-key values here BEFORE partitions are planned — the
  // range shrinks to the keys' hull and out-of-hull chunks are never
  // read (pinned in SeqSourceSpec). A real warehouse source applies
  // the same values to its partition index.
  private var rlo = lo
  private var rhi = hi
  override def filterAttributes()
    : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions
      .column("id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("id", vs) if vs.nonEmpty =>
      val longs = vs.collect { case l: java.lang.Long => l.longValue() }
      if (longs.nonEmpty) {
        rlo = math.max(rlo, longs.min)
        rhi = math.min(rhi, longs.max)
      }
    case EqualTo("id", v: Long) =>
      rlo = math.max(rlo, v); rhi = math.min(rhi, v)
    case _ => () // unsupported runtime shapes: keep the static range
  }

  /** Post-pushdown statistics ([[SupportsReportStatistics]]): row
    * count and bytes for the PRUNED range, so Catalyst sizes joins
    * against this source from real numbers — a filtered slice under
    * the broadcast threshold auto-broadcasts with NO user hint
    * (spec-pinned), exactly how a bespoke 100 TB source earns good
    * plans. ~24 bytes/row: two longs + a short string. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, math.min(hi, n - 1) - math.max(lo, 0L) + 1)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * 24L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def description(): String =
    s"graft_seq pushed=[${math.max(lo, 0)}..${math.min(hi, n - 1)}] " +
      s"cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (n + parts - 1) / parts)
    val planned = (0L until n by step).map(s => (s, math.min(s + step, n)))
      // the pushdown payoff: chunks wholly outside the (statically
      // pushed ∩ runtime-filtered) range are never planned — the
      // custom-source analog of static + dynamic partition pruning
      .filter { case (s, e) => e > rlo && s <= rhi }
      .map { case (s, e) =>
        SeqPartition(math.max(s, rlo), math.min(e, rhi + 1)): InputPartition
      }.toArray
    SeqSource.lastPlannedPartitions = planned.length
    planned
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

/** Vector fill size for the columnar path. */
private[sources] object SeqBatch { val Size = 4096 }

private[sources] case class SeqPartition(start: Long, end: Long)
  extends InputPartition

private[sources] class SeqReaderFactory(required: StructType)
  extends PartitionReaderFactory {

  /** The source reads COLUMNAR: values are generated straight into
    * on-heap column vectors in [[SeqBatch.Size]] chunks, so the scan
    * enters the query as `ColumnarBatch`es and Spark inserts the one
    * ColumnarToRow boundary where codegen wants rows — the vectorized
    * contract a performant custom source implements ([[createReader]]
    * stays as the row-based reference path, proven equal in
    * SeqSourceSpec). */
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(
      p: InputPartition): PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = {
    import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
    import org.apache.spark.sql.vectorized.ColumnarBatch
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[ColumnarBatch] {
      private var cur = sp.start
      private var batch: ColumnarBatch = _
      override def next(): Boolean = {
        if (batch != null) { batch.close(); batch = null }
        if (cur >= sp.end) false
        else {
          val n = math.min(SeqBatch.Size.toLong, sp.end - cur).toInt
          val vecs = required.fields.map(f =>
            new OnHeapColumnVector(n, f.dataType))
          var i = 0
          while (i < n) {
            val id = cur + i
            required.fieldNames.zipWithIndex.foreach {
              case ("id", c) => vecs(c).putLong(i, id)
              case ("sq", c) => vecs(c).putLong(i, (id * id) % 97L)
              case ("tag", c) =>
                val b = (id % 7L).toString.getBytes("UTF-8")
                vecs(c).putByteArray(i, b)
              case _ => ()
            }
            i += 1
          }
          cur += n
          batch = new ColumnarBatch(
            vecs.map(v => v: org.apache.spark.sql.vectorized.ColumnVector),
            n)
          true
        }
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit =
        if (batch != null) { batch.close(); batch = null }
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var cur = sp.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { cur += 1; cur < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(fields.toSeq.map {
          case "id" => cur
          case "sq" => (cur * cur) % 97L
          case "tag" => UTF8String.fromString((cur % 7L).toString)
        })
      override def close(): Unit = ()
    }
  }
}
