package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Custom DataSource V2 tap — the parity piece for the reference's
  * user-mounted `Dataset`/`Chunker` inputs (`Dampr.read_input`,
  * `/root/reference/dampr/dampr.py:857-877`; custom-tap test
  * `tests/test_dampr.py:344-367`). A deterministic generated table
  * `(id, value)` split into `partitions` input splits — each split is
  * planned as its own task, exactly how the reference's Chunker yields
  * one Dataset per chunk (`dampr/dataset.py:420-443`).
  *
  * Usage: `spark.read.format("graft.sources.RangeTap")
  *   .option("rows", 1000).option("partitions", 8).load()`
  */
class RangeTap extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeTap.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeTapTable(
      properties.getOrDefault("rows", "100").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object RangeTap {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false)))
}

class RangeTapTable(rows: Long, partitions: Int) extends Table with SupportsRead {
  override def name(): String = s"range_tap($rows,$partitions)"
  override def schema(): StructType = RangeTap.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = RangeTap.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val per = math.max(1L, (rows + partitions - 1) / partitions)
          (0 until partitions).map { p =>
            val start = p * per
            val end = math.min(rows, start + per)
            RangeTapPartition(start, end): InputPartition
          }.filter { case RangeTapPartition(s, e) => s < e }.toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          (partition: InputPartition) => {
            val RangeTapPartition(start, end) = partition
            new PartitionReader[InternalRow] {
              private var i = start - 1
              override def next(): Boolean = { i += 1; i < end }
              // deterministic "payload": value = id * 2 + 1
              override def get(): InternalRow = InternalRow(i, i * 2 + 1)
              override def close(): Unit = ()
            }
          }
      }
    }
}

case class RangeTapPartition(start: Long, end: Long) extends InputPartition
