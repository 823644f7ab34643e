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

  /** Scheme/authority-insensitive path key for set membership. */
  private def norm(p: Path): String = p.toUri.getPath

  /** The COMMITTED data-file set per the sink's `_spark_metadata` log, or
    * None for a plain parquet table (no log). Files on disk but absent
    * from the log are uncommitted leftovers of aborted micro-batch tasks —
    * batch readers never see them (the metadata-aware read skips them),
    * so a compaction that read the raw listing would bake their duplicate
    * or truncated rows PERMANENTLY into the rewrite. */
  def committedFiles(spark: SparkSession, tableDir: String): Option[Set[String]] = {
    val metaPath = new Path(tableDir, "_spark_metadata")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) None
    else {
      import org.apache.spark.sql.execution.streaming.sinks.FileStreamSinkLog
      // Conservative on absent information: an empty or unreadable log
      // names no committed files, and deleting on that basis would wipe
      // data — fall back to the raw listing instead.
      scala.util.Try {
        val log = new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, metaPath.toString)
        log.allFiles().map(s => norm(new Path(s.path))).toSet
      }.toOption.filter(_.nonEmpty)
    }
  }

  /** Compact one date partition of a layer table. Returns
    * (filesBefore, filesAfter). When `committed` is given (see
    * [[committedFiles]]), only committed files feed the rewrite; listed-
    * but-uncommitted orphans are excluded from the data and deleted with
    * the originals (they are semantically absent — garbage collection). */
  def compactPartition(
      spark: SparkSession,
      tableDir: String,
      partition: String, // e.g. "event_date=2024-03-01"
      targetFileMB: Int = 128,
      committed: Option[Set[String]] = None,
      zorder: Option[(String, String)] = None,
      targetFilesOverride: Option[Int] = None): (Int, Int) = {
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
    val toRead = committed match {
      case Some(set) => originals.filter(st => set.contains(norm(st.getPath)))
      case None => originals
    }
    val hasOrphans = toRead.length != originals.length
    val totalBytes = toRead.map(_.getLen).sum
    val targetFiles = targetFilesOverride.getOrElse(
      math.max(1, (totalBytes / (targetFileMB * 1024L * 1024L)).toInt))
    if (!hasOrphans && originals.length <= targetFiles)
      return (originals.length, originals.length)
    if (toRead.isEmpty) {
      // All-orphan partition: nothing committed to rewrite — just GC.
      originals.foreach(st => fs.delete(st.getPath, false))
      return (originals.length, 0)
    }

    val source = spark.read.parquet(toRead.map(_.getPath.toString).toIndexedSeq: _*)
    zorder match {
      case None =>
        source.repartition(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
      // Z-ordered rewrite: each dimension is range-NORMALIZED into the
      // interleave's 16-bit domain (the raw-value mask would silently
      // wrap any dimension exceeding 65535 and destroy clustering), then
      // rows split into equal-width Morton blocks — power-of-two widths,
      // so boundaries fall on code bit edges and every file stays tight
      // in BOTH dimensions. The whole rewrite is ONE job: rows hash-
      // partition on the block id and a dynamic-partition write emits
      // exactly one file per block (the writer starts a new file per
      // partition value, and each block lives in exactly one task) — an
      // exact value split, where RangePartitioner's sampled bounds could
      // merge two blocks into one file straddling a quadrant, and a
      // driver-side per-block loop would issue O(blocks) jobs. The one
      // stats pass reads only the partition being rewritten; block
      // widths derive from the full 2^32 code domain, not an observed
      // max, so no second pass. Helper columns never reach the files.
      case Some((a, b)) =>
        import org.apache.spark.sql.functions.{col, expr, lit, floor, min, max}
        val st = source.agg(
          min(col(a)), max(col(a)), min(col(b)), max(col(b))).head()
        // An all-null dimension has null min/max → constant 0; rows with a
        // null dimension VALUE normalize at the dimension minimum (a
        // deterministic edge block) instead of null-propagating into an
        // arbitrary block.
        def lo(i: Int): Long =
          Option(st.getAs[Number](i)).map(_.longValue).getOrElse(0L)
        def normSql(c: String, mn: Long, mx: Long): String =
          s"CAST((COALESCE(CAST($c AS DOUBLE), ${mn}.0D) - $mn) * 65535.0" +
            s" / ${math.max(1L, mx - mn)} AS BIGINT)"
        val zSql = graft.operators.ZOrder.mortonSql(
          normSql(a, lo(0), lo(1)), normSql(b, lo(2), lo(3)))
        // Codes span [0, 2^32); the smallest power-of-two width yielding
        // ≤ targetFiles blocks keeps boundaries on code bit edges.
        val domain = 1L << 32
        val w0 = (domain + targetFiles - 1) / targetFiles
        val width =
          if ((w0 & (w0 - 1)) == 0) w0
          else java.lang.Long.highestOneBit(w0) * 2
        fs.delete(tmp, true)
        source.withColumn("__z", expr(zSql))
          .withColumn("__zb", floor(col("__z") / lit(width)))
          .repartition(targetFiles, col("__zb"))
          .sortWithinPartitions("__zb", "__z")
          .drop("__z")
          .write.partitionBy("__zb").mode("overwrite").parquet(tmp.toString)
        // Flatten the write-side __zb=N/ layout into the tmp root (driver
        // metadata renames, not jobs); block-tagged names keep them unique.
        fs.listStatus(tmp)
          .filter(d => d.isDirectory && d.getPath.getName.startsWith("__zb="))
          .foreach { d =>
            val bId = d.getPath.getName.drop("__zb=".length)
            fs.listStatus(d.getPath)
              .filter(f => f.isFile && isDataFile(f.getPath.getName))
              .foreach { f =>
                val dest = new Path(tmp, s"zb$bId-${f.getPath.getName}")
                require(fs.rename(f.getPath, dest),
                  s"z-order flatten rename failed: ${f.getPath} -> $dest")
              }
            fs.delete(d.getPath, true)
          }
    }
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
      partPath: Path,
      prefix: String = "compacted-"): Int = {
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
      val dest = new Path(partPath, s"$prefix$tag.parquet")
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

  /** Tmp-dir name segment for a (possibly nested or empty) partition path:
    * "/" cannot appear in a single path component, so it is escaped, as is
    * the escape char itself; the empty (unpartitioned) root gets a marker
    * no real hive dir can produce (it contains the escape char). */
  private def encodeTmpName(partName: String): String =
    if (partName.isEmpty) "%ROOT%"
    else partName.replace("%", "%25").replace("/", "%2F")

  private def decodeTmpTarget(root: Path, encoded: String): Path =
    if (encoded == "%ROOT%") root
    else new Path(root, encoded.replace("%2F", "/").replace("%25", "%"))

  /** Audit record of a [[deleteWhere]] run. */
  final case class DeleteReport(
      filesTotal: Int,      // data files in the table before the delete
      filesRewritten: Int,  // files that contained ≥1 matching row
      rowsDeleted: Long)    // matching rows removed

  /** Targeted row erasure (GDPR right-to-be-forgotten / retention purge)
    * without a transaction log: `DELETE FROM table WHERE predicate` as a
    * file-level rewrite that touches ONLY the files containing matches.
    *
    * Why this shape at 100 TB: an erasure request matches a tiny fraction
    * of files (one user's rows cluster in few partitions; a retention cut
    * is partition-aligned), so phase 1 — one predicate scan grouped by
    * `_metadata.file_path` — prices the delete at O(matching files)
    * rewrites, with every untouched file left byte-identical on disk. A
    * naive `filter(!pred).write` would rewrite the entire table. With a
    * partition-keyed predicate the phase-1 scan itself prunes directories
    * (hive-style partition pruning), so even the read side is bounded.
    *
    * Null semantics follow SQL DELETE: rows where the predicate is TRUE
    * are removed; FALSE and NULL rows are kept.
    *
    * Crash safety reuses the compaction swap protocol per affected
    * partition dir — rewrite to a hidden tmp, `_originals` manifest as the
    * commit point, idempotent completion on replay — so a crash anywhere
    * leaves either the old files (pre-commit) or a completed delete
    * (post-commit), never a half-state. Like compaction, this targets
    * CLOSED tables/partitions (no live stream tailing the dir).
    *
    * The audit report is the compliance deliverable: which files were
    * rewritten and how many rows were erased, without retaining the erased
    * content anywhere (the manifest names files, not rows).
    *
    * Driver-memory posture (the 100 TB question): the per-file match
    * manifest stays a DataFrame — only the aggregate totals and the
    * DISTINCT AFFECTED DIRECTORY list are collected, and each directory's
    * affected file list is pulled inside its own rewrite step. A broad
    * predicate over a million-file table therefore holds O(affected dirs)
    * + O(files in one dir) on the driver, not O(matched files); the audit
    * listing streams (counts, never a materialized FileStatus seq).
    *
    * `orphanRetentionMs` is the same safety contract as [[vacuum]]'s
    * retention: an uncommitted file younger than the window may belong to
    * a micro-batch that is mid-commit (written, not yet logged), so
    * rather than garbage-collect it and retire the log — breaking the
    * in-flight batch — the delete REFUSES to run, because a young orphan
    * is direct evidence the documented closed-table contract is violated
    * (something is still writing). Older orphans are swept as before. */
  def deleteWhere(spark: SparkSession, tableDir: String, predicate: String,
      orphanRetentionMs: Long = 10L * 60 * 1000,
      nowMs: Long = System.currentTimeMillis): DeleteReport = {
    import org.apache.spark.sql.functions.{coalesce, col, count, expr, lit, regexp_replace, sum}
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(tableDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return DeleteReport(0, 0, 0L)

    // Finish any committed-but-unapplied prior delete swaps first, so this
    // run's phase-1 scan never reads a half-swapped dir. (Compaction
    // recovers its own tmps the same way on its next run.)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n.startsWith(".delete_tmp_")) {
        val target = decodeTmpTarget(root, n.stripPrefix(".delete_tmp_"))
        if (fs.exists(new Path(st.getPath, "_originals")))
          applySwap(fs, st.getPath, target, "deleted-")
        else fs.delete(st.getPath, true)
      }
    }

    // Phase 1: one scan — matching rows grouped by source file, kept as a
    // DISTRIBUTED manifest (fp, parent dir, n). Files with zero matches
    // never appear and are never rewritten. The scan is metadata-aware
    // when a sink log exists, so uncommitted orphans never enter it.
    val table = spark.read.parquet(tableDir)
    val manifest = table
      .filter(expr(predicate))
      .groupBy(col("_metadata.file_path").as("fp"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dir", regexp_replace(col("fp"), "/[^/]+$", ""))
      .persist()
    try {
      val totals = manifest
        .agg(coalesce(sum(col("n")), lit(0L)).as("rows"), count(lit(1)).as("files"))
        .head()
      val rowsDeleted = totals.getLong(0)
      // Audit denominator + orphan sweep in ONE STREAMED walk: count data
      // files and (for logged tables) act on uncommitted ones — nothing is
      // materialized beyond the recursion stack and the orphan being
      // visited.
      val committedSnap = committedFiles(spark, tableDir)
      val cutoff = nowMs - orphanRetentionMs
      var filesTotal = 0
      var youngOrphan: Option[Path] = None
      def walk(p: Path)(onOrphan: org.apache.hadoop.fs.FileStatus => Unit): Unit =
        fs.listStatus(p).foreach { s =>
          if (isDataFile(s.getPath.getName)) {
            if (s.isDirectory) walk(s.getPath)(onOrphan)
            else {
              filesTotal += 1
              if (committedSnap.exists(c => !c.contains(norm(s.getPath))))
                onOrphan(s)
            }
          }
        }
      // Guard pass first: a young uncommitted file means something may
      // still be mid-commit on this "closed" table — refuse to delete
      // anything (vacuum's retention contract) rather than break it.
      walk(root) { s =>
        if (s.getModificationTime >= cutoff && youngOrphan.isEmpty)
          youngOrphan = Some(s.getPath)
      }
      require(youngOrphan.isEmpty,
        s"deleteWhere: uncommitted file ${youngOrphan.get} is younger than " +
        s"the ${orphanRetentionMs} ms orphan-retention window — the table " +
        "may have an active writer; close the stream (or raise nowMs) and retry")
      if (rowsDeleted == 0L) return DeleteReport(filesTotal, 0, 0L)

      // A streaming-sink commit log names the ORIGINAL files — paths the
      // rewrite below deletes — so, exactly like compactTable, a rewriting
      // delete RETIRES the log and the table becomes a plain listed parquet
      // table. (Leaving the stale log would break metadata-aware reads AND
      // make a later vacuum treat the rewritten survivors as uncommitted
      // orphans — data loss.) Before retiring, uncommitted orphans — all
      // beyond the retention window per the guard above — are garbage-
      // collected: once the log is gone their rows would become visible to
      // listed reads.
      committedSnap.foreach { _ =>
        filesTotal = 0
        walk(root)(s => fs.delete(s.getPath, false))
        fs.delete(new Path(root, "_spark_metadata"), true)
      }

      // Phase 2: per affected partition dir, rewrite ONLY that dir's
      // affected files minus matching rows. Partition columns live in the
      // dir name, not the files: the rewrite read derives them via basePath
      // (so the predicate can reference them) and drops them again before
      // writing back into the dir. Only the dir list is collected up
      // front; each dir's file list is pulled from the manifest when its
      // turn comes.
      val affectedDirs = manifest.select(col("dir")).distinct()
        .collect().map(_.getString(0)).sorted
      var rewritten = 0
      affectedDirs.foreach { dirStr =>
        val files = manifest.filter(col("dir") === dirStr)
          .select(col("fp")).collect().map(_.getString(0)).sorted
        val dirPath = new Path(dirStr)
        val partName = norm(dirPath).stripPrefix(norm(root)).stripPrefix("/")
        val tmp = new Path(root, s".delete_tmp_${encodeTmpName(partName)}")
        fs.delete(tmp, true)
        val partCols = partName.split("/").toSeq
          .filter(_.contains("=")).map(_.split("=", 2)(0))
        val kept = spark.read
          .option("basePath", tableDir)
          .parquet(files.toIndexedSeq: _*)
          .filter(!expr(s"coalesce(($predicate), false)"))
          .drop(partCols: _*)
        kept.coalesce(math.max(1, files.length)).write.mode("overwrite").parquet(tmp.toString)
        // Commit point: manifest of exactly the files this rewrite replaces.
        val originals = files.mkString("\n")
        val staged = new Path(tmp, "_originals.staging")
        val out = fs.create(staged, true)
        try out.write(originals.getBytes(StandardCharsets.UTF_8)) finally out.close()
        require(fs.rename(staged, new Path(tmp, "_originals")),
          s"could not commit delete manifest in $tmp")
        applySwap(fs, tmp, dirPath, "deleted-")
        rewritten += files.length
      }
      DeleteReport(filesTotal, rewritten, rowsDeleted)
    } finally manifest.unpersist()
  }

  /** Audit record of a [[vacuum]] run. */
  final case class VacuumReport(
      orphansDeleted: Int,  // uncommitted data files removed
      orphanBytes: Long,    // their total size
      tmpDirsDeleted: Int,  // stale pre-commit rewrite scratch dirs removed
      filesKept: Int)       // live data files left untouched

  /** VACUUM: garbage-collect a table's dead files — the Delta `VACUUM`
    * analog for the engine's log-less tables.
    *
    * Two classes of garbage accrete under a streaming sink + the rewrite
    * protocol, and batch readers see neither (so they are pure storage
    * waste that still costs listing time and object-store money):
    *
    *   - UNCOMMITTED data files: a micro-batch task that died after
    *     writing its file but before its batch committed leaves the file
    *     on disk, absent from the `_spark_metadata` commit log — the
    *     metadata-aware read skips it forever;
    *   - STALE REWRITE SCRATCH: a compaction/delete rewrite that crashed
    *     BEFORE its `_originals` commit point leaves a hidden
    *     `.compact_tmp_*` dir. (A scratch dir WITH a manifest is a
    *     committed-but-unapplied swap; it is rolled FORWARD by the next
    *     maintenance pass, never vacuumed.)
    *
    * The retention window is the safety contract, exactly as in Delta's
    * VACUUM: a file younger than `retentionMs` may belong to a micro-batch
    * that is mid-commit (written, not yet logged) — deleting it would turn
    * an in-flight batch's success into data loss on retry. Age is judged
    * by filesystem modification time against the caller's clock, and
    * `nowMs` is injectable so tests (and audit replays) are deterministic.
    *
    * Tables without a commit log get only the scratch-dir sweep: with no
    * committed-set source of truth, every listed data file must be
    * presumed live (deleting on a guess is how vacuums eat tables).
    *
    * 100 TB posture: one recursive listing + O(dead files) deletes, no
    * data reads or rewrites at all; committed-set membership is a hash
    * probe per file against the sink log already held for compaction. */
  def vacuum(spark: SparkSession, tableDir: String, retentionMs: Long,
      nowMs: Long = System.currentTimeMillis): VacuumReport = {
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return VacuumReport(0, 0L, 0, 0)
    val cutoff = nowMs - retentionMs
    val committed = committedFiles(spark, tableDir)
    def walk(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (!isDataFile(st.getPath.getName)) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st)
      }
    val files = walk(root)
    val orphans = committed match {
      case Some(set) =>
        files.filter(st =>
          !set.contains(norm(st.getPath)) && st.getModificationTime < cutoff)
      case None => Seq.empty
    }
    orphans.foreach(st => fs.delete(st.getPath, false))
    val tmps = fs.listStatus(root).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isDirectory &&
        (n.startsWith(".compact_tmp_") || n.startsWith(".delete_tmp_")) &&
        !fs.exists(new Path(st.getPath, "_originals")) &&
        st.getModificationTime < cutoff
    }
    tmps.foreach(st => fs.delete(st.getPath, true))
    VacuumReport(orphans.length, orphans.map(_.getLen).sum, tmps.length,
      files.length - orphans.length)
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
    // Snapshot the committed-file set BEFORE retiring the log: the
    // rewrites must exclude uncommitted orphans (aborted-task leftovers
    // the log never admitted), which become listable the moment the log
    // is gone.
    val committed = committedFiles(spark, tableDir)
    // Retire the sink commit log: it lists pre-compaction files and would
    // make metadata-aware readers miss the rewritten data.
    fs.delete(new Path(dir, "_spark_metadata"), true)
    fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("=") &&
        isDataFile(st.getPath.getName))
      .map { st =>
        val (before, after) = compactPartition(
          spark, tableDir, st.getPath.getName, targetFileMB, committed)
        (st.getPath.getName, before, after)
      }
  }
}
