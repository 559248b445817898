package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  /** Deterministic synthetic message for a global row index. */
  private[sources] def synthetic(i: Long): (String, String, String) = {
    val sender = s"login${i % 7}"
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
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = MessagesSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = rows match {
    case None => Array(MessagesPartition(-1L, -1L))
    case Some(n) =>
      val p = math.max(1, partitions)
      (0 until p).map { i =>
        val start = i * n / p
        val end = (i + 1) * n / p
        MessagesPartition(start, end): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MessagesReaderFactory
}

private case class MessagesPartition(start: Long, end: Long) extends InputPartition

private class MessagesReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val mp = p.asInstanceOf[MessagesPartition]
    val it =
      if (mp.start < 0) MessagesSource.golden.iterator
      else Iterator.range(mp.start, mp.end).map(MessagesSource.synthetic)
    new PartitionReader[InternalRow] {
      private var current: (String, String, String) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current._1),
        UTF8String.fromString(current._2),
        UTF8String.fromString(current._3))
      override def close(): Unit = ()
    }
  }
}
