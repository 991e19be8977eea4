package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{sources => sqlsrc}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Custom DataSource V2 SINK (and matching read-back source) — the
  * write-path parity piece for the reference's sink surface
  * (`Dampr.sink_tsv`, `/root/reference/dampr/dampr.py:610-637`), built
  * the way a cluster sink must be: a TWO-PHASE COMMIT protocol.
  *
  * Each task attempt writes to a unique staging file under
  * `path/_temp/` and returns a [[TsvCommit]] message naming it; only
  * the DRIVER's `BatchWrite.commit` — which Spark calls once, with one
  * message per committed task — promotes staged files to their final
  * `part-NNNNN.tsv` names and stamps `_SUCCESS`. A failed or
  * speculative duplicate attempt's file is never named in a commit
  * message, so it is swept with `_temp/` instead of leaking into the
  * output: exactly the semantics `FileCommitProtocol` gives Spark's
  * built-in file sinks, reproduced here over `java.nio` (on a real
  * cluster the staging dir would live on the shared store and the
  * renames are the object-store/HDFS atomic-rename step).
  *
  * Values are escaped (`\t` `\n` `\r` `\\`, null as `\N`) so ANY
  * string round-trips — the reference's csv-writer inherits the same
  * convention from Python's csv module.
  *
  * Write: `df.write.format("graft.sources.TsvTap").option("path", p)
  *   .mode("overwrite").save()`  (TRUNCATE capability ⇒ overwrite-all)
  * Read:  `spark.read.format("graft.sources.TsvTap")
  *   .option("path", p).option("schema", "a BIGINT, b STRING").load()`
  * — one input split per committed part file.
  */
class TsvTap extends TableProvider {
  // write path: take the DataFrame's schema as-is
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "graft.sources.TsvTap reads need .option(\"schema\", \"<DDL>\") — the sink writes raw TSV, not self-describing files")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graft.sources.TsvTap needs .option(\"path\", ...)")
    new TsvTable(path, schema)
  }
}

object TsvTap {
  private[graft] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }

  private[graft] def unescape(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case o => b.append(c); b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private[sources] val Null = "\\N"

  private[sources] def cellToString(row: InternalRow, i: Int, dt: DataType): String =
    if (row.isNullAt(i)) Null
    else dt match {
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case DoubleType => row.getDouble(i).toString
      case FloatType => row.getFloat(i).toString
      case BooleanType => row.getBoolean(i).toString
      case StringType => escape(row.getUTF8String(i).toString)
      case other => throw new IllegalArgumentException(
        s"TsvTap supports flat atomic columns; got $other (project structs/arrays to scalars first)")
    }

  private[sources] def parseCell(s: String, dt: DataType): Any =
    if (s == Null) null
    else dt match {
      case LongType => s.toLong
      case IntegerType => s.toInt
      case ShortType => s.toShort
      case ByteType => s.toByte
      case DoubleType => s.toDouble
      case FloatType => s.toFloat
      case BooleanType => s.toBoolean
      case StringType => UTF8String.fromString(unescape(s))
      case other => throw new IllegalArgumentException(s"TsvTap cannot read $other")
    }

  /** Best-effort evaluation of a pushed-down source filter against the
    * RAW cells of one TSV row (before any InternalRow is built):
    * true = keep, false = skip. Unknown filter shapes never reach here
    * ([[TsvTable]] declines them in pushFilters). Numerics compare as
    * doubles — the filter value's runtime type (Integer vs Long vs
    * Double) follows the query literal, not the column.
    */
  private[graft] def evalFilter(f: sqlsrc.Filter, cells: Array[String],
      schema: StructType): Boolean = {
    def cell(name: String): Option[String] = {
      val s = cells(schema.fieldIndex(name))
      if (s == Null) None else Some(s)
    }
    def num(v: Any): Double = v match {
      case n: Number => n.doubleValue()
      case b: Boolean => if (b) 1d else 0d
      case s => s.toString.toDouble
    }
    // the skip is ADVISORY (Catalyst re-applies every filter after the
    // scan), so an unparsable comparison keeps the row rather than
    // failing the task — e.g. a numeric literal pushed against a
    // string column
    def cmp(name: String, v: Any)(op: Int => Boolean): Boolean = cell(name).exists { raw =>
      v match {
        case _: String => op(unescape(raw).compareTo(v.toString))
        case _ =>
          try op(java.lang.Double.compare(raw.toDouble, num(v)))
          catch { case _: NumberFormatException => true }
      }
    }
    f match {
      case sqlsrc.EqualTo(a, v) => cmp(a, v)(_ == 0)
      case sqlsrc.GreaterThan(a, v) => cmp(a, v)(_ > 0)
      case sqlsrc.GreaterThanOrEqual(a, v) => cmp(a, v)(_ >= 0)
      case sqlsrc.LessThan(a, v) => cmp(a, v)(_ < 0)
      case sqlsrc.LessThanOrEqual(a, v) => cmp(a, v)(_ <= 0)
      case sqlsrc.IsNotNull(a) => cell(a).isDefined
      case sqlsrc.IsNull(a) => cell(a).isEmpty
      case _ => true
    }
  }

  private[graft] def supportedFilter(f: sqlsrc.Filter, schema: StructType): Boolean = {
    def flat(name: String) = schema.fieldNames.contains(name)
    f match {
      case sqlsrc.EqualTo(a, _: String) => flat(a)
      case sqlsrc.EqualTo(a, _: Number) => flat(a)
      case sqlsrc.EqualTo(_, _) => false
      case sqlsrc.GreaterThan(a, _: Number) => flat(a)
      case sqlsrc.GreaterThanOrEqual(a, _: Number) => flat(a)
      case sqlsrc.LessThan(a, _: Number) => flat(a)
      case sqlsrc.LessThanOrEqual(a, _: Number) => flat(a)
      case sqlsrc.IsNotNull(a) => flat(a)
      case sqlsrc.IsNull(a) => flat(a)
      case _ => false
    }
  }

  private[sources] def partFiles(path: Path): Seq[Path] =
    if (!Files.isDirectory(path)) Seq.empty
    else {
      val s = Files.list(path)
      try s.iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".tsv"))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
}

class TsvTable(path: String, schema0: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"tsv_tap($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  // ---- read: one split per committed part file, with COLUMN PRUNING
  // pushed into the parser — Catalyst hands the scan only the columns
  // the query references (SupportsPushDownRequiredColumns), and the
  // reader type-converts exactly those cells (the line is read either
  // way — TSV has no columnar layout — but per-cell parse/alloc work
  // tracks the projection, and `.explain` shows the honest ReadSchema
  // the same way the parquet scan does; pinned in SourcesSpec) ----
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
        with SupportsPushDownAggregates {
      private var required: StructType = schema0
      private var accepted: Array[sqlsrc.Filter] = Array.empty
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      // Filters the raw-cell evaluator can run are accepted for
      // scan-side row SKIPPING (no parse, no row alloc for misses);
      // every filter is also returned as residual so Catalyst keeps
      // the authoritative post-scan Filter — pushdown here is a
      // performance contract, not a correctness dependency.
      override def pushFilters(filters: Array[sqlsrc.Filter]): Array[sqlsrc.Filter] = {
        accepted = filters.filter(TsvTap.supportedFilter(_, schema0))
        filters
      }
      override def pushedFilters(): Array[sqlsrc.Filter] = accepted
      // Bare COUNT(*) is answered from line counts — one long per
      // part file, zero cells parsed (partial pushdown: Spark sums
      // the per-partition counts). Catalyst only offers aggregate
      // pushdown when every filter was FULLY pushed; ours are
      // residual by design, so a filtered count never reaches this
      // path and the advisory-skip semantics stay safe.
      private var countStar = false
      override def pushAggregation(
          agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
        val ok = agg.groupByExpressions.isEmpty &&
          agg.aggregateExpressions.length == 1 &&
          agg.aggregateExpressions.head
            .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]
        if (ok) countStar = true
        ok
      }
      override def build(): Scan = if (countStar) new Scan {
        override def readSchema(): StructType =
          StructType(Seq(StructField("count", LongType, nullable = false)))
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            TsvTap.partFiles(Paths.get(path))
              .map(p => TsvFilePartition(p.toString): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            (partition: InputPartition) => {
              val TsvFilePartition(file) = partition
              new PartitionReader[InternalRow] {
                private var emitted = false
                override def next(): Boolean = !emitted
                override def get(): InternalRow = {
                  emitted = true
                  val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
                  try InternalRow(lines.count()) finally lines.close()
                }
                override def close(): Unit = ()
              }
            }
        }
      } else new Scan {
        private val req = required
        private val flt = accepted
        override def readSchema(): StructType = req
        override def toBatch: Batch = new Batch {
          override def planInputPartitions(): Array[InputPartition] =
            TsvTap.partFiles(Paths.get(path))
              .map(p => TsvFilePartition(p.toString): InputPartition).toArray
          override def createReaderFactory(): PartitionReaderFactory = {
            val nCells = schema0.fields.length
            val full = schema0
            val skips = flt
            // (cell index in the file row, output type) per kept column
            val picks = req.fields.map(f =>
              (schema0.fieldIndex(f.name), f.dataType))
            (partition: InputPartition) => {
              val TsvFilePartition(file) = partition
              new PartitionReader[InternalRow] {
                private val lines = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
                private val it = lines.iterator()
                private var cur: Array[String] = _
                override def next(): Boolean = {
                  cur = null
                  while (cur == null && it.hasNext) {
                    val cells = it.next().split("\t", -1)
                    require(cells.length == nCells,
                      s"TsvTap row has ${cells.length} cells, schema has $nCells")
                    if (skips.forall(TsvTap.evalFilter(_, cells, full))) cur = cells
                  }
                  cur != null
                }
                override def get(): InternalRow = {
                  val vals = new Array[Any](picks.length)
                  var i = 0
                  while (i < picks.length) {
                    vals(i) = TsvTap.parseCell(cur(picks(i)._1), picks(i)._2); i += 1
                  }
                  InternalRow.fromSeq(vals.toIndexedSeq)
                }
                override def close(): Unit = lines.close()
              }
            }
          }
        }
      }
    }

  // ---- write: staged task files, driver-side commit ----
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new TsvBatchWrite(path, info.schema(), doTruncate)
      }
    }
}

case class TsvFilePartition(file: String) extends InputPartition
case class TsvCommit(tempFile: String, partitionId: Int) extends WriterCommitMessage

class TsvBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = path; val s = schema
    (partitionId: Int, taskId: Long) => new DataWriter[InternalRow] {
      // unique per task ATTEMPT: a speculative or retried attempt of
      // the same partition stages to a different file, and only the
      // attempt whose message reaches commit() is promoted
      private val temp = Paths.get(p, "_temp", s"attempt-$partitionId-$taskId.tsv")
      Files.createDirectories(temp.getParent)
      private val out = Files.newBufferedWriter(temp, StandardCharsets.UTF_8)
      private val fields = s.fields.map(_.dataType)

      override def write(row: InternalRow): Unit = {
        var i = 0
        while (i < fields.length) {
          if (i > 0) out.write('\t')
          out.write(TsvTap.cellToString(row, i, fields(i)))
          i += 1
        }
        out.write('\n')
      }
      override def commit(): WriterCommitMessage = {
        out.close(); TsvCommit(temp.toString, partitionId)
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(temp) }
      override def close(): Unit = ()
    }
  }

  /** Driver-side atomic publish: promote exactly the committed
    * attempts' staged files, sweep everything else.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    if (truncate) TsvTap.partFiles(dir).foreach(Files.delete)
    messages.collect { case TsvCommit(tempFile, pid) =>
      Files.move(Paths.get(tempFile), dir.resolve(f"part-$pid%05d.tsv"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    sweepTemp()
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepTemp()

  private def sweepTemp(): Unit = {
    val temp = Paths.get(path, "_temp")
    if (Files.isDirectory(temp)) {
      val s = Files.list(temp)
      try s.iterator().asScala.foreach(Files.deleteIfExists)
      finally s.close()
      Files.deleteIfExists(temp)
    }
  }
}
