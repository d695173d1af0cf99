package graft.sources.v2

import java.time.LocalDate
import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DateType, IntegerType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 form of the reference's per-day windowed extraction
  * ([function_app.py:89-121]): the serial `for day in date_range: fetch(day)`
  * loop becomes a table whose INPUT PARTITIONS are day ranges — a
  * 1000-executor cluster fetches 1000 day-windows concurrently, replacing
  * the reference's 30-second-sleep rate-limited loop with source-level
  * parallelism.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.DayRangeSource")
  *   .option("from", "2024-01-01").option("to", "2024-03-31")
  *   .option("numPartitions", "8").load()
  * }}}
  *
  * Emits (day DATE, day_ordinal INT). The per-day payload fetch is the
  * integration point: a production subclass performs its HTTP/CSV read
  * inside [[DayRangeReader]] where the day loop used to be — schema,
  * planning and parallelism all stay as modeled (and tested) here.
  */
class DayRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DayRangeSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DayRangeTable(properties.asScala.toMap)
}

object DayRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("day", DateType, nullable = false),
    StructField("day_ordinal", IntegerType, nullable = false)))
}

private class DayRangeTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"dayrange(${props.getOrElse("from", "?")}..${props.getOrElse("to", "?")})"
  override def schema(): StructType = DayRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownFilters {
      private var from = LocalDate.parse(options.get("from"))
      private var to = LocalDate.parse(options.get("to")) // inclusive, like pd.date_range
      private val nPart = math.max(1, Option(options.get("numPartitions")).map(_.toInt).getOrElse(4))
      private var pushed: Array[Filter] = Array.empty

      /** Source-level partition pruning: range predicates on `day` narrow
        * [from, to] BEFORE planning, so pruned day windows are never even
        * scheduled — the DSv2 analog of parquet partition pruning.
        */
      private def asDate(v: Any): Option[LocalDate] = v match {
        case d: java.sql.Date => Some(d.toLocalDate)
        case d: LocalDate => Some(d)
        case _ => None
      }

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        val (accepted, rejected) = filters.partition {
          case EqualTo("day", v) => asDate(v).isDefined
          case GreaterThanOrEqual("day", v) => asDate(v).isDefined
          case GreaterThan("day", v) => asDate(v).isDefined
          case LessThanOrEqual("day", v) => asDate(v).isDefined
          case LessThan("day", v) => asDate(v).isDefined
          case _ => false
        }
        accepted.foreach {
          case EqualTo("day", v) => asDate(v).foreach { d =>
            if (d.isAfter(from)) from = d
            if (d.isBefore(to)) to = d
          }
          case GreaterThanOrEqual("day", v) => asDate(v).foreach { d =>
            if (d.isAfter(from)) from = d
          }
          case GreaterThan("day", v) => asDate(v).map(_.plusDays(1)).foreach { d =>
            if (d.isAfter(from)) from = d
          }
          case LessThanOrEqual("day", v) => asDate(v).foreach { d =>
            if (d.isBefore(to)) to = d
          }
          case LessThan("day", v) => asDate(v).map(_.minusDays(1)).foreach { d =>
            if (d.isBefore(to)) to = d
          }
          case _ => ()
        }
        pushed = accepted
        rejected // Spark re-applies these above the scan
      }
      override def pushedFilters(): Array[Filter] = pushed

      override def build(): Scan = this
      override def readSchema(): StructType = DayRangeSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        // contradictory pushed filters legitimately yield an empty range
        val nDays = math.max(0, (to.toEpochDay - from.toEpochDay + 1).toInt)
        val per = math.max(1, math.ceil(nDays.toDouble / nPart).toInt)
        (0 until nDays by per).map { start =>
          DayRangePartition(
            from.toEpochDay + start,
            math.min(start + per, nDays) - start,
            start): InputPartition
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) =>
          new DayRangeReader(partition.asInstanceOf[DayRangePartition])
    }
}

private case class DayRangePartition(startEpochDay: Long, nDays: Int, startOrdinal: Int)
  extends InputPartition

/** One partition = one contiguous day window; this is where a production
  * source performs its per-day fetch (HTTP GET + CSV parse in the
  * reference) — executor-side, batched, parallel across partitions.
  */
private class DayRangeReader(p: DayRangePartition) extends PartitionReader[InternalRow] {
  private var i = -1
  override def next(): Boolean = { i += 1; i < p.nDays }
  override def get(): InternalRow =
    InternalRow((p.startEpochDay + i).toInt, p.startOrdinal + i)
  override def close(): Unit = ()
}
