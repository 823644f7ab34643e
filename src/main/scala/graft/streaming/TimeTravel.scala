package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog

/** Snapshot ("time travel") reads over a streaming file sink's commit log —
  * the Delta-less version of `VERSION AS OF`: the sink's `_spark_metadata`
  * log already records exactly which files each micro-batch committed, so a
  * table AS OF batch N is simply the union of files committed by batches
  * ≤ N. No extra bookkeeping is written; the capability falls out of the
  * exactly-once mechanism the layers use anyway.
  *
  * Scale/ops notes:
  *   - the log read is driver-side metadata (one sequential pass over
  *     per-batch manifests), the data read is a normal pruned parquet scan
  *     over the selected files;
  *   - snapshots are only as durable as the files: a later
  *     [[Maintenance.compactTable]] RETIRES the commit log (rewritten
  *     files, originals deleted), which collapses history to "latest" —
  *     compaction is the explicit history-truncation point, same as
  *     VACUUM;
  *   - batch ids are the sink's epoch ids (monotone, checkpoint-backed),
  *     so "AS OF batch" is reproducible across restarts.
  */
object TimeTravel {

  /** Batch ids present in the sink log, ascending (empty → not a sink). */
  def batches(spark: SparkSession, tableDir: String): Seq[Long] = {
    val metaPath = new Path(tableDir, "_spark_metadata")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) return Seq.empty
    val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, metaPath.toString)
    log.getLatestBatchId().map(last => 0L to last).getOrElse(Seq.empty[Long]).toSeq
  }

  /** The table as of (and including) `batchId` — exactly the files those
    * batches committed, read with the caller's schema expectations. */
  def asOf(spark: SparkSession, tableDir: String, batchId: Long): DataFrame = {
    val metaPath = new Path(tableDir, "_spark_metadata")
    val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, metaPath.toString)
    // Only ADD-actioned entries are live data: the log format defines a
    // DELETE action (unused by today's sink but part of the contract), and
    // compaction may surface an entry more than once — filter and dedup so
    // the read is robust to log evolution, not just today's writer.
    val files = log.get(Some(0L), Some(batchId))
      .flatMap(_._2)
      .filter(_.action == FileStreamSinkLog.ADD_ACTION)
      .map(_.path)
      .distinct
      .toIndexedSeq
    require(files.nonEmpty,
      s"no files committed at or before batch $batchId in $tableDir")
    spark.read.parquet(files: _*)
  }
}
