package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** `UrlsInput` parity (`/root/reference/dampr/inputs.py:74-97`): stream
  * text lines from a list of URLs, one URL per input partition, with a
  * `skip_on_error` flag that silently drops unreachable URLs — the
  * reference's exact semantics. Any `java.net.URL`-readable scheme
  * works (`file:`, `http:`, ...); tests use `file:` (this environment
  * has no egress).
  *
  * Usage: `spark.read.format("graft.sources.UrlsTap")
  *   .option("urls", "file:///a.txt,file:///b.txt")
  *   .option("skipOnError", "true").load()`
  * Schema: (url string, line string).
  */
class UrlsTap extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = UrlsTap.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UrlsTapTable(
      properties.getOrDefault("urls", "").split(",").map(_.trim).filter(_.nonEmpty),
      properties.getOrDefault("skipOnError", "true").toBoolean)
}

object UrlsTap {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("line", StringType, nullable = false)))
}

class UrlsTapTable(urls: Array[String], skipOnError: Boolean) extends Table with SupportsRead {
  override def name(): String = s"urls_tap(${urls.length})"
  override def schema(): StructType = UrlsTap.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = UrlsTap.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          urls.map(u => UrlPartition(u, skipOnError): InputPartition)
        override def createReaderFactory(): PartitionReaderFactory =
          (partition: InputPartition) => {
            val UrlPartition(url, skip) = partition
            new PartitionReader[InternalRow] {
              private var src: scala.io.Source = _
              private val lines: Iterator[String] =
                try {
                  src = scala.io.Source.fromURL(url)
                  src.getLines()
                } catch {
                  case e: Exception =>
                    if (skip) Iterator.empty
                    else throw new RuntimeException(s"failed to read $url", e)
                }
              private var current: String = _
              override def next(): Boolean =
                try {
                  if (lines.hasNext) { current = lines.next(); true } else false
                } catch {
                  // mid-stream read failure: with skip_on_error the
                  // reference truncates the bad URL and moves on
                  case _: Exception if skip => false
                }
              override def get(): InternalRow =
                InternalRow(UTF8String.fromString(url), UTF8String.fromString(current))
              override def close(): Unit = if (src != null) src.close()
            }
          }
      }
    }
}

case class UrlPartition(url: String, skipOnError: Boolean) extends InputPartition
