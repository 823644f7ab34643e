package graft.streaming

import java.nio.charset.StandardCharsets
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
  * Swap protocol (no transaction log, so the commit point is explicit):
  *   1. the rewrite is written to a hidden tmp dir;
  *   2. a `_originals` manifest (the exact files the rewrite replaces) is
  *      written into the tmp dir — THIS is the commit point;
  *   3. rewritten files are renamed into the partition under names derived
  *      deterministically from the tmp contents, then the manifest's files
  *      are deleted, then the tmp dir is removed.
  * A crash before (2) discards the tmp dir on the next run; a crash after
  * (2) is completed idempotently on the next run (renames skip existing
  * destinations, deletes are exists-guarded) BEFORE the partition is read
  * again, so duplication is never baked into a subsequent rewrite. Readers
  * concurrent with step (3) can transiently observe duplicated rows (never
  * an empty partition); compact CLOSED partitions — older than the
  * watermark, no writer appending — in a maintenance window if readers
  * need strict consistency.
  *
  * Contract change: a streaming file sink's `_spark_metadata` commit log
  * enumerates the ORIGINAL files, so compaction retires it — the table
  * becomes a plain listed parquet table. Consequently, compact only tables
  * that no downstream stream is still tailing (archived / closed layers);
  * a live tail would re-discover the rewritten files as new input.
  */
object Maintenance {

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

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

    val tmp = new Path(s"$tableDir/.compact_tmp_$partition")
    // Finish or discard a previous run before reading the partition.
    if (fs.exists(new Path(tmp, "_originals"))) applySwap(fs, tmp, partPath)
    else fs.delete(tmp, true)

    val originals = fs.listStatus(partPath)
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
    val totalBytes = originals.map(_.getLen).sum
    val targetFiles = math.max(1, (totalBytes / (targetFileMB * 1024L * 1024L)).toInt)
    if (originals.length <= targetFiles) return (originals.length, originals.length)

    spark.read.parquet(partPath.toString)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // Commit point: record exactly which files the rewrite replaces. The
    // manifest is staged and RENAMED into place — creation+write is not
    // atomic, and a truncated manifest read as committed would leave the
    // originals undeleted next to the rewrite (permanent duplication).
    val manifest = originals.map(_.getPath.toString).mkString("\n")
    val staged = new Path(tmp, "_originals.staging")
    val out = fs.create(staged, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(staged, new Path(tmp, "_originals")),
      s"could not commit compaction manifest in $tmp")

    val after = applySwap(fs, tmp, partPath)
    (originals.length, after)
  }

  /** Complete a committed rewrite: rename tmp data files into the partition
    * (names derived from the tmp file, so re-runs are idempotent and never
    * collide with a prior generation), delete the manifest's originals,
    * drop the tmp dir. Returns the rewritten file count. */
  private def applySwap(
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: Path,
      partPath: Path): Int = {
    val manifestPath = new Path(tmp, "_originals")
    val in = fs.open(manifestPath)
    val manifest =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    val originals = manifest.split("\n").filter(_.nonEmpty).map(new Path(_))

    val rewritten = fs.listStatus(tmp)
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
      .sortBy(_.getPath.getName)
    rewritten.foreach { st =>
      val tag = java.lang.Long.toHexString(
        (st.getPath.getName.hashCode.toLong << 32) ^ st.getLen)
      val dest = new Path(partPath, s"compacted-$tag.parquet")
      // A completed rename leaves no tmp source, so re-runs never reach
      // here for already-applied files; a dest that exists while the source
      // is still in tmp is a genuine name collision — fail rather than
      // skip-and-delete (which would silently lose this file's rows).
      require(!fs.exists(dest),
        s"compaction destination collision: $dest already exists")
      require(fs.rename(st.getPath, dest),
        s"compaction rename failed: ${st.getPath} -> $dest")
    }
    originals.foreach(p => if (fs.exists(p)) fs.delete(p, false))
    fs.delete(tmp, true)
    rewritten.length
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
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        isDataFile(st.getPath.getName))
      .map { st =>
        val (before, after) =
          compactPartition(spark, tableDir, st.getPath.getName, targetFileMB)
        (st.getPath.getName, before, after)
      }
  }
}
