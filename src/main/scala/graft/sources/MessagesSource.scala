package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source for (sender, text, receiver) messages —
  * the engine's custom-connector extension point (SURVEY §2 S1/S5: the
  * reference's fixture producers become a Spark source).
  *
  * Modes:
  *  - default: the reference's golden 4-message fixture
  *    (KafkaStreamApp.java:237-240) in one partition;
  *  - `option("rows", N).option("partitions", P)`: N deterministic
  *    synthetic messages split across P InputPartitions — each
  *    partition generates its own row range independently (no driver
  *    materialization, no shuffle), which is the property that lets
  *    the same source shape scale to arbitrary row counts on a
  *    cluster.
  *
  * Scan optimizations (SURVEY §4 — the same contract parquet scans
  * honor, so `.explain` shows pruned schemas and no residual Filter):
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): readers
  *    emit only the projected fields;
  *  - filter pushdown ([[SupportsPushDownFilters]]): `sender = 'x'`
  *    is absorbed by the scan; in synthetic mode the generator then
  *    SKIPS non-matching indices (sender cycles mod 7, so the reader
  *    walks every 7th index — 1/7th of the work, the row-group-skip
  *    analog), and the filter never runs post-scan.
  *
  * Usage: `spark.read.format("graft.sources.MessagesSource").load()`.
  */
class MessagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MessagesSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new MessagesTable
}

object MessagesSource {
  val schema: StructType = StructType(Seq(
    StructField("sender", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("receiver", StringType, nullable = true)))

  /** README.md:41-46 golden inputs. */
  val golden: Seq[(String, String, String)] = Seq(
    ("login4", "Java", "login1"),
    ("login2", "Spring", "login1"),
    ("login3", "1С", "login1"),
    ("login5", "Политика React", "login1"))

  private[sources] val vocab =
    Array("Java", "Spring", "Политика", "React", "Kafka", "Spark", "1C")

  private[sources] val SenderCycle = 7

  /** Deterministic synthetic message for a global row index. */
  private[sources] def synthetic(i: Long): (String, String, String) = {
    val sender = s"login${i % SenderCycle}"
    val receiver = s"login${(i / 7) % 5}"
    val text = s"${vocab((i % vocab.length).toInt)} ${vocab(((i / 3) % vocab.length).toInt)} #$i"
    (sender, text, receiver)
  }
}

private class MessagesTable extends Table with SupportsRead {
  override def name(): String = "graft_messages"
  override def schema(): StructType = MessagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rows = Option(options.get("rows")).map(_.toLong)
    val parts = Option(options.get("partitions")).map(_.toInt).getOrElse(1)
    new MessagesScan(rows, parts)
  }
}

private class MessagesScan(rows: Option[Long], partitions: Int)
    extends ScanBuilder with Scan with Batch
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = MessagesSource.schema
  private var senderEq: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (pushed, residual) = filters.partition {
      case EqualTo("sender", v: String) => senderEq.isEmpty && { senderEq = Some(v); true }
      // this source never emits nulls, so inferred IsNotNull guards
      // are no-ops it can absorb (otherwise they survive as a residual
      // Filter above the scan)
      case IsNotNull("sender" | "text" | "receiver") => true
      case _ => false
    }
    _pushed = pushed
    residual
  }
  private var _pushed: Array[Filter] = Array.empty
  override def pushedFilters(): Array[Filter] = _pushed

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_messages PushedFilters: [${_pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = rows match {
    case None => Array(MessagesPartition(-1L, -1L, required.fieldNames, senderEq))
    case Some(n) =>
      val p = math.max(1, partitions)
      (0 until p).map { i =>
        val start = i * n / p
        val end = (i + 1) * n / p
        MessagesPartition(start, end, required.fieldNames, senderEq): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MessagesReaderFactory
}

private case class MessagesPartition(start: Long, end: Long,
                                     fields: Array[String],
                                     senderEq: Option[String]) extends InputPartition

private class MessagesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MessagesPartition]
    val it: Iterator[(String, String, String)] =
      if (mp.start < 0)
        mp.senderEq.fold(MessagesSource.golden.iterator)(v =>
          MessagesSource.golden.iterator.filter(_._1 == v))
      else mp.senderEq match {
        case Some(v) =>
          // sender = login{i % 7}: matching indices form an arithmetic
          // progression — generate ONLY those (the pushed filter skips
          // 6/7ths of the range instead of filtering after the fact)
          val cycle = MessagesSource.SenderCycle
          (0 until cycle).find(k => s"login$k" == v) match {
            case None => Iterator.empty
            case Some(k) =>
              val first = mp.start + ((k - mp.start % cycle + cycle) % cycle)
              Iterator.iterate(first)(_ + cycle).takeWhile(_ < mp.end)
                .map(MessagesSource.synthetic)
          }
        case None => Iterator.range(mp.start, mp.end).map(MessagesSource.synthetic)
      }
    new PartitionReader[InternalRow] {
      private val proj: Array[((String, String, String)) => UTF8String] =
        mp.fields.map {
          case "sender" => (t: (String, String, String)) => UTF8String.fromString(t._1)
          case "text" => (t: (String, String, String)) => UTF8String.fromString(t._2)
          case "receiver" => (t: (String, String, String)) => UTF8String.fromString(t._3)
        }
      private var current: (String, String, String) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = {
        // one allocation per row, no intermediate collection copies
        val vals = new Array[Any](proj.length)
        var i = 0
        while (i < proj.length) { vals(i) = proj(i)(current); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
