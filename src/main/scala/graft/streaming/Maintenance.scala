package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table maintenance for the streaming layer sinks.
  *
  * A micro-batched file sink accretes one-or-more files per trigger per
  * partition; at 100 TB/day and 1-minute triggers that is thousands of
  * small files per day, which degrades scan planning (file listing) and
  * read throughput (per-file open cost). Compaction rewrites a partition's
  * files into ~`targetFileMB` outputs.
  *
  * The rewrite is atomic per partition (write to a temp dir, swap via
  * rename) and safe to run while readers are active on object stores or
  * HDFS where rename is atomic; the streaming *writer* must not be
  * appending to the compacted partition concurrently (compact closed —
  * i.e. older than the watermark — date partitions only).
  *
  * Contract change: a streaming file sink's `_spark_metadata` commit log
  * enumerates the ORIGINAL files, so compaction must retire it — the table
  * becomes a plain listed parquet table afterwards. Consequently, compact
  * only tables that no downstream stream is still tailing (archived /
  * closed layers); a live tail would re-discover the rewritten files as
  * new input.
  */
object Maintenance {

  /** Compact one date partition of a layer table. Returns
    * (filesBefore, filesAfter). */
  def compactPartition(
      spark: SparkSession,
      tableDir: String,
      partition: String, // e.g. "event_date=2024-03-01"
      targetFileMB: Int = 128): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val partPath = new Path(s"$tableDir/$partition")
    val fs = partPath.getFileSystem(conf)
    if (!fs.exists(partPath)) return (0, 0)

    val dataFiles = fs.listStatus(partPath).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, (totalBytes / (targetFileMB * 1024L * 1024L)).toInt)
    if (dataFiles.length <= targetFiles) return (dataFiles.length, dataFiles.length)

    val tmp = new Path(s"$tableDir/.compact_tmp_$partition")
    fs.delete(tmp, true)
    spark.read.parquet(partPath.toString)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)

    // Swap: move compacted files in, remove the originals.
    val compacted = fs.listStatus(tmp).filter(st =>
      st.isFile && !st.getPath.getName.startsWith("_"))
    dataFiles.foreach(st => fs.delete(st.getPath, false))
    compacted.zipWithIndex.foreach { case (st, i) =>
      fs.rename(st.getPath, new Path(partPath, f"compacted-$i%05d.parquet"))
    }
    fs.delete(tmp, true)
    (dataFiles.length, compacted.length)
  }

  /** Compact every closed partition of a layer table. */
  def compactTable(
      spark: SparkSession,
      tableDir: String,
      targetFileMB: Int = 128): Seq[(String, Int, Int)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Seq.empty
    // Retire the sink commit log: it lists pre-compaction files and would
    // make metadata-aware readers miss the rewritten data.
    fs.delete(new Path(dir, "_spark_metadata"), true)
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map { st =>
        val (before, after) =
          compactPartition(spark, tableDir, st.getPath.getName, targetFileMB)
        (st.getPath.getName, before, after)
      }
  }
}
