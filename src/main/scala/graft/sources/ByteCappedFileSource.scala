package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Incremental CSV file source with a BYTES-per-trigger admission cap — the
  * core-Spark analog of the reference's Auto Loader `maxBytesPerTrigger`
  * (`01_bronze_layer_ingestion.py:18`), which the built-in file source only
  * approximates with a files-count cap. Implemented on the DataSource V2
  * micro-batch API, so it is also the engine's demonstration of a custom
  * streaming connector.
  *
  * Contract:
  *   - `path` is a landing directory of CSV files with monotone lexicographic
  *     names (the standard event-time-prefixed landing-zone layout — the
  *     same ordering assumption Auto Loader's lexical mode makes); the
  *     offset is "number of files consumed" over the name-sorted listing,
  *     so restarts resume exactly-once from the checkpoint;
  *   - each micro-batch admits files greedily until their cumulative size
  *     would exceed `maxBytesPerTrigger` OR their count reaches
  *     `maxFilesPerTrigger` — both Auto Loader caps on one stream, batch
  *     closed by whichever budget is hit first (always at least one file,
  *     like Spark's own admission control);
  *   - one input partition per file — reader parallelism follows the batch's
  *     file count;
  *   - rows parse with the simple unquoted-CSV row shape the reference's
  *     generator writes (`data_generator.py:43-52`): header line skipped
  *     when `header=true`, `,`-split fields, empty → null, LongType fields
  *     via `try`-style parse (null on failure) to match PERMISSIVE reads.
  *
  * Scale notes: the directory listing is one RPC per trigger on the driver
  * (same as every file source); file bytes never pass through the driver —
  * readers stream their one file on executors.
  */
class ByteCappedFileSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  // Schema must be user-supplied (like the built-in streaming file sources
  // with inference off — the engine treats declared schemas as authoritative).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "byte-capped source requires an explicit .schema(...)")

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ByteCappedTable(schema, properties.get("path"),
      Option(properties.get("maxBytesPerTrigger")).map(_.toLong)
        .getOrElse(10L * 1024 * 1024 * 1024),
      // Both Auto Loader caps on ONE stream (reference
      // 01_bronze_layer_ingestion.py:17-18): a batch closes at whichever
      // budget — file count or cumulative bytes — it hits first.
      Option(properties.get("maxFilesPerTrigger")).map(_.toInt)
        .getOrElse(Int.MaxValue),
      Option(properties.get("header")).forall(_.toBoolean))
}

private[sources] class ByteCappedTable(
    tableSchema: StructType, path: String, maxBytes: Long, maxFiles: Int,
    header: Boolean)
    extends Table with SupportsRead {
  require(path != null, "byte-capped source requires option 'path'")
  // Fail at table resolution, not deep inside generated code: the CSV
  // reader materializes only these types.
  tableSchema.fields.foreach { f =>
    require(
      f.dataType == StringType || f.dataType == LongType || f.dataType == DoubleType,
      s"byte-capped CSV source supports string/bigint/double columns; " +
        s"'${f.name}' is ${f.dataType.catalogString}")
  }

  override def name(): String = s"byte_capped_csv($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ByteCappedStream(tableSchema, path, maxBytes, maxFiles, header)
      }
    }
}

/** Offset = files consumed from the name-sorted listing, plus the NAME of the
  * last consumed file. The count alone trusts the monotone-name contract
  * silently: a deletion, rename, or late arrival sorting before the consumed
  * prefix would remap indices to different files and break exactly-once
  * without detection. Carrying the boundary name lets every consumer of the
  * offset assert the re-listed prefix still ends where it did — violations
  * fail the batch loudly instead of reading wrong files. */
private[sources] case class FileIndexOffset(filesConsumed: Int, lastFile: String)
    extends Offset {
  override def json(): String = {
    val esc = lastFile.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"filesConsumed":$filesConsumed,"lastFile":"$esc"}"""
  }
}

private[sources] class ByteCappedStream(
    schema: StructType, path: String, maxBytes: Long, maxFiles: Int,
    header: Boolean)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow contract: freeze the listing at trigger time and
  // drain (in capped batches) exactly up to it, ignoring later arrivals.
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listing().length)

  /** Stable name-sorted listing of (path, size). Re-listed per trigger;
    * the already-consumed prefix is immutable under the monotone-name
    * contract. (java.io for brevity — an object-store deployment swaps in
    * the Hadoop FileSystem API; the admission-control logic is unchanged.) */
  private def listing(): Array[(String, Long)] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
    files.map(f => (f.getAbsolutePath, f.length()))
  }

  override def initialOffset(): Offset = FileIndexOffset(0, "")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Assert a checkpointed offset still points at the same boundary in the
    * current listing; a shrunken listing or a changed boundary name means the
    * landing dir was mutated under the monotone-name contract. */
  private def checkBoundary(
      files: Array[(String, Long)], off: FileIndexOffset, role: String): Unit = {
    val n = off.filesConsumed
    require(n <= files.length,
      s"byte-capped source: $role offset covers $n files but only " +
        s"${files.length} are listed in $path — files were deleted or renamed")
    if (n > 0 && off.lastFile.nonEmpty) {
      val actual = new java.io.File(files(n - 1)._1).getName
      require(actual == off.lastFile,
        s"byte-capped source: $role offset expects file #$n to be " +
          s"'${off.lastFile}' but the listing has '$actual' — a file was " +
          s"deleted, renamed, or arrived out of lexicographic order in $path")
    }
  }

  /** The engine hands us the stream's true start offset — admission is
    * capped relative to it (greedy under the byte budget, always at least
    * one file so a single oversized file cannot wedge the stream). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val files = listing()
    val startOff = start.asInstanceOf[FileIndexOffset]
    checkBoundary(files, startOff, "start")
    val end = availableNowCap.fold(files.length)(math.min(_, files.length))
    val from = startOff.filesConsumed
    var i = from
    var bytes = 0L
    while (i < end && i - from < maxFiles &&
        (i == from || bytes + files(i)._2 <= maxBytes)) {
      bytes += files(i)._2
      i += 1
    }
    mkOffset(files, i)
  }

  private def mkOffset(files: Array[(String, Long)], consumed: Int): FileIndexOffset =
    FileIndexOffset(consumed,
      if (consumed == 0) "" else new java.io.File(files(consumed - 1)._1).getName)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def reportLatestOffset(): Offset = {
    val files = listing()
    mkOffset(files, files.length)
  }

  override def deserializeOffset(json: String): Offset = {
    val consumed = """"filesConsumed"\s*:\s*(\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
      .getOrElse("""\d+""".r.findFirstIn(json).get.toInt)
    // lastFile absent in pre-upgrade checkpoints → "" (boundary unchecked).
    val last = """"lastFile"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
    FileIndexOffset(consumed, last)
  }

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val files = listing()
    val startOff = start.asInstanceOf[FileIndexOffset]
    val endOff = end.asInstanceOf[FileIndexOffset]
    checkBoundary(files, startOff, "start")
    checkBoundary(files, endOff, "end")
    files.slice(startOff.filesConsumed, endOff.filesConsumed)
      .map(f => CsvFilePartition(f._1): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CsvReaderFactory(schema, header)

  override def stop(): Unit = ()
}

private[sources] case class CsvFilePartition(file: String) extends InputPartition

private[sources] class CsvReaderFactory(schema: StructType, header: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CsvFilePartition].file
    new PartitionReader[InternalRow] {
      private val lines = {
        val src = scala.io.Source.fromFile(file, "UTF-8")
        val it = src.getLines()
        if (header && it.hasNext) it.next()
        (it, src)
      }
      private var row: InternalRow = _

      override def next(): Boolean =
        if (lines._1.hasNext) { row = parse(lines._1.next()); true }
        else false

      override def get(): InternalRow = row

      private def parse(line: String): InternalRow = {
        val parts = line.split(",", -1)
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          val raw = if (i < parts.length) parts(i) else null
          if (raw == null || raw.isEmpty) null
          else f.dataType match {
            case LongType => try java.lang.Long.valueOf(raw.trim.toLong)
              catch { case _: NumberFormatException => null }
            case DoubleType => try java.lang.Double.valueOf(raw.trim.toDouble)
              catch { case _: NumberFormatException => null }
            case _ => UTF8String.fromString(raw)
          }
        }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }

      override def close(): Unit = lines._2.close()
    }
  }
}
