package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** LSM-shaped, file-range-pruned parquet index over a 64-bit key — the
  * layout that makes a bounded probe cost O(probe), not O(index).
  *
  * An incremental pipeline (e.g. [[graft.llm.Dedup.incrementPairs]]
  * behind [[graft.streaming.CurateStream]]) appends per-batch deltas and
  * probes the accumulated table with a bounded key set every micro-batch.
  * Stored flat, every probe re-scans the whole table — measured
  * 0.98 s → 5.89 s for the SAME 100-doc increment as the index grew
  * 50k → 1.5M docs (INCREMENT_BENCH.json, round 11). This layout caps
  * that cost:
  *
  *   - '''delta zone''' `root/delta/batch=<id>/` — raw idempotent
  *     appends (a replayed batch overwrites its own dir: exactly-once
  *     without a transaction log). Probes read deltas whole; their count
  *     is bounded by compaction cadence.
  *   - '''sorted run''' `root/run=<gen>/data/` — all older deltas merged,
  *     globally sorted by the key, split into files of `rowsPerFile`
  *     rows (`maxRecordsPerFile`, so file count never inflates the
  *     write's task count). Because the run is ONE contiguous sort,
  *     file key-ranges are disjoint: a probe key can land in at most
  *     one file.
  *   - '''manifest''' `run=<gen>/meta/` — per-file (min_key, max_key,
  *     rows). A probe prunes driver-side against its sorted key list
  *     (binary search per file range) and reads ONLY intersecting files.
  *
  * Probe IO is therefore min(index, |keys| · rowsPerFile) rows + the
  * open deltas — FLAT in index size once the index outgrows the probe
  * ceiling. `rowsPerFile` is the knee: smaller files prune tighter but
  * multiply file count; size it so (expected probe keys) × rowsPerFile
  * sits well under the steady-state index (locally: 1–4k rows/file for
  * 100-doc increments; on a 100 TB deployment with ~100k-doc increments
  * the same math gives ~1M-row ≈ 100 MB files — exactly the file size a
  * warehouse wants anyway).
  *
  * Compaction reuses the crash-safe swap discipline of
  * [[graft.llm.MmFeatures.compactBatches]]: the new run lands in a
  * staging tmp (carrying a `_merged` marker), a root-level
  * `.compact_manifest` naming the replaced dirs is the commit point and
  * is deleted LAST, after delete-originals → rename. Run generations
  * are monotonic, so a half-finished swap can never mistake the old run
  * for the new one. Every public read path completes a pending swap
  * first.
  */
object SortedRunIndex {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Idempotent delta append: a replayed batch overwrites its own dir. */
  def append(df: DataFrame, root: String, batchId: Long): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(s"$root/delta/batch=$batchId")

  private def listDirs(spark: SparkSession, parent: Path, prefix: String): Seq[String] = {
    val fs = fsOf(spark, parent)
    if (!fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName)
      .sortBy(_.stripPrefix(prefix).toLong)
  }

  private def deltaDirs(spark: SparkSession, root: String): Seq[String] =
    listDirs(spark, new Path(root, "delta"), "batch=")
      .map(n => s"$root/delta/$n")

  private def runDir(spark: SparkSession, root: String): Option[String] =
    listDirs(spark, new Path(root), "run=").lastOption.map(n => s"$root/$n")

  /** Complete a crashed compaction swap before any read. Same branch
    * structure as MmFeatures.compactBatches: the root manifest (deleted
    * last) names the dirs the new run replaces; its first line is the
    * destination run name; `_merged` markers tell which side of the
    * rename the crash landed on. */
  private def recover(spark: SparkSession, root: String): Unit = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val manifest = new Path(rootP, ".compact_manifest")
    if (!fs.exists(manifest)) return
    val lines = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(manifest)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    val destName = lines.head
    val originals = lines.tail
    val tmp = new Path(rootP, "compact-tmp")
    val dest = new Path(rootP, destName)
    if (fs.exists(new Path(dest, "_merged"))) {
      // Rename already durable: clear stragglers and commit.
      originals.foreach { n =>
        val p = new Path(rootP, n)
        if (fs.exists(p)) fs.delete(p, true)
      }
      if (fs.exists(tmp)) fs.delete(tmp, true)
    } else if (fs.exists(new Path(tmp, "_merged"))) {
      // Merged data still in tmp: delete originals, then swap. The
      // manifest survives this whole block, so any crash re-enters here.
      originals.foreach { n =>
        val p = new Path(rootP, n)
        if (fs.exists(p)) fs.delete(p, true)
      }
      fs.rename(tmp, dest)
    }
    // else: aborted rewrite, originals untouched — just drop the manifest.
    fs.delete(manifest, false)
  }

  /** Everything currently in the index (run + deltas), unpruned — the
    * fallback spelling and what compaction itself reads. */
  def readAll(spark: SparkSession, root: String, empty: => DataFrame): DataFrame = {
    recover(spark, root)
    val paths = runDir(spark, root).map(r => s"$r/data").toSeq ++
      deltaDirs(spark, root)
    if (paths.isEmpty) empty else spark.read.parquet(paths: _*)
  }

  // Manifest cache: one tiny parquet read per (root, run-generation), not
  // per probe. A new generation (compaction) changes the key.
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[(String, Long, Long)]]()

  private def manifestOf(spark: SparkSession, run: String): Array[(String, Long, Long)] =
    manifestCache.computeIfAbsent(run, _ =>
      spark.read.parquet(s"$run/meta").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._2))

  /** The run files a sorted probe-key array can possibly intersect —
    * exposed for tests and diagnostics: (selected paths, total run files). */
  def selectFiles(spark: SparkSession, root: String,
      keys: Array[Long]): (Seq[String], Int) = {
    runDir(spark, root) match {
      case None => (Seq.empty, 0)
      case Some(run) =>
        val meta = manifestOf(spark, run)
        val sorted = keys.sorted
        def hits(mn: Long, mx: Long): Boolean = {
          // first key >= mn, then check <= mx
          var lo = 0; var hi = sorted.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (sorted(mid) < mn) lo = mid + 1 else hi = mid
          }
          lo < sorted.length && sorted(lo) <= mx
        }
        (meta.collect { case (f, mn, mx) if hits(mn, mx) => s"$run/data/$f" }.toSeq,
          meta.length)
    }
  }

  /** Rows that can match any of `keys` on the key column — a SUPERSET
    * scan (whole intersecting files + all open deltas); the caller's
    * join does the exact matching. IO is bounded by
    * |keys| · rowsPerFile + deltas, independent of run size. */
  def probe(spark: SparkSession, root: String, keys: Array[Long],
      empty: => DataFrame): DataFrame = {
    recover(spark, root)
    val (runFiles, _) = selectFiles(spark, root, keys)
    val paths = runFiles ++ deltaDirs(spark, root)
    if (paths.isEmpty) empty
    else {
      // A probe hands Spark THOUSANDS of explicit file paths; above the
      // default 32-path threshold the reader launches a DISTRIBUTED
      // listing job whose scheduling overhead (~4 s for 2.5k paths,
      // measured) dwarfs the driver-side stat calls it replaces. Force
      // driver-side listing for the plan — these are exact file paths,
      // not trees to walk.
      val conf = "spark.sql.sources.parallelPartitionDiscovery.threshold"
      val prev = spark.conf.getOption(conf)
      spark.conf.set(conf, (paths.length + 1).toString)
      try spark.read.parquet(paths: _*)
      finally prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
    }
  }

  /** Fold the run and all-but-the-newest-`keepLast` deltas into one new
    * sorted run generation. `keepLast ≥ 1` keeps the most recent,
    * still-replayable micro-batch out of the merge (the
    * [[graft.llm.MmFeatures.compactBatches]] replay-safety argument:
    * the stream's checkpoint has committed past everything merged).
    * Returns (delta dirs folded, files in the new run); (0, 0) when
    * there was nothing to fold. */
  def compact(spark: SparkSession, root: String, keyCol: String,
      rowsPerFile: Int, keepLast: Int = 1): (Int, Int) = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    if (!fs.exists(rootP)) return (0, 0)
    // Single-maintainer guard: a second live compaction refuses loudly
    // instead of racing this one's tmp/manifest (crash recovery of a DEAD
    // maintainer stays automatic — see MaintenanceLease).
    val lease = MaintenanceLease.acquire(fs, rootP, "SortedRunIndex.compact")
    try compactLocked(spark, root, keyCol, rowsPerFile, keepLast)
    finally MaintenanceLease.release(fs, lease)
  }

  private def compactLocked(spark: SparkSession, root: String, keyCol: String,
      rowsPerFile: Int, keepLast: Int): (Int, Int) = {
    recover(spark, root)
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val deltas = deltaDirs(spark, root)
    val fold = deltas.dropRight(math.max(keepLast, 0))
    val run = runDir(spark, root)
    if (fold.isEmpty) return (0, 0)
    val gen = run.map(_.split("run=").last.toLong + 1L).getOrElse(0L)
    val srcs = run.map(r => s"$r/data").toSeq ++ fold

    val tmp = new Path(rootP, "compact-tmp")
    fs.delete(tmp, true)
    val data = spark.read.parquet(srcs: _*)
    val n = data.count()
    // Task count targets ~512k rows/task; maxRecordsPerFile does the
    // fine-grained file split, so pruning granularity never inflates the
    // job's task count. sortWithinPartitions + range partitioning = one
    // global sort; sequential in-task file splits preserve it, so file
    // ranges are disjoint.
    val tasks = math.max(1, math.min(256, (n / 524288L).toInt + 1))
    data.repartitionByRange(tasks, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.option("maxRecordsPerFile", rowsPerFile.toLong)
      .mode(SaveMode.Overwrite).parquet(s"$tmp/data")
    // Manifest from one columnar scan of the key column.
    spark.read.parquet(s"$tmp/data")
      .select(element_at(split(col("_metadata.file_path"), "/"), -1).as("file"),
        col(keyCol).as("k"))
      .groupBy("file")
      .agg(min("k").as("min_key"), max("k").as("max_key"),
        count(lit(1)).as("rows"))
      .coalesce(1)
      .write.parquet(s"$tmp/meta")
    fs.create(new Path(tmp, "_merged"), true).close()
    // Commit point: dest run name + the dirs this rewrite replaces.
    val manifest = new Path(rootP, ".compact_manifest")
    val out = fs.create(manifest, true)
    val rel = (run.toSeq ++ fold).map(_.stripPrefix(root).stripPrefix("/"))
    out.write((s"run=$gen" +: rel).mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    recover(spark, root)
    val nFiles = fs.listStatus(new Path(rootP, s"run=$gen/data"))
      .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    (fold.length, nFiles)
  }
}
