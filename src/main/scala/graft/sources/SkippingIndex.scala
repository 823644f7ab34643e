package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level membership index for point-lookup skipping — the
  * data-skipping sidecar (Delta file stats / Iceberg metadata / Hudi
  * bloom-index shape) for plain parquet tables:
  *
  *   - [[build]]: ONE scan groups the table by `_metadata.file_path` and
  *     records each file's sorted distinct 16-bit key fingerprints
  *     (xxhash64 & 0xFFFF) — a dense per-file membership summary with no
  *     false negatives (a key present in the file always lands in its
  *     fingerprint set) and ≤ 65,536 entries per file however large the
  *     file is;
  *   - [[lookup]]: probes the (tiny) index for files whose set may contain
  *     the key and reads ONLY those — at 100 TB a point lookup touches the
  *     index plus the handful of candidate files instead of every file in
  *     the table. False positives cost one extra file read; false
  *     negatives cannot happen, so results are exact.
  *
  * The candidate file list is collected to the driver — deliberately: a
  * scan's file list is ALWAYS driver state (Spark's own planner holds it);
  * it is O(candidate files), not O(rows). Layout matters exactly as with
  * any skipping scheme: files that partition the key space (range/bucket
  * layout, e.g. `repartitionByRange` on the key before writing, or the
  * z-order writer here) prune to ~1 file per key; random layout degrades
  * toward reading everything — the index makes layout quality measurable
  * (candidate count IS the metric).
  */
object SkippingIndex {

  private def fp(key: Column): Column =
    (xxhash64(key).bitwiseAND(lit(65535L))).cast("int")

  /** One file's membership summary with a HARD 8 KB residency cap:
    * a sorted fingerprint array while sparse (< 2,048 entries → < 8 KB),
    * a dense 65,536-bit bitmap (1,024 longs = 8 KB flat) beyond. The
    * uncapped `Array[Int]` form reached 256 KB for a fingerprint-saturated
    * file — at ~1M files (the 100 TB order) that is driver-state measured
    * in hundreds of GB; the cap bounds it at ≤ 8 KB/file ≈ 8 GB at 1M
    * files worst-case, and far less on real tables (sparse files store
    * 4 bytes/fingerprint). `tools/SkipIndexResidency` measures both
    * regimes at a synthetic 100k-file registration. */
  sealed trait FileFps {
    def contains(f: Int): Boolean
    /** Approximate resident bytes (payload + object header). */
    def sizeBytes: Long
  }
  final case class SparseFps(fps: Array[Int]) extends FileFps {
    def contains(f: Int): Boolean = java.util.Arrays.binarySearch(fps, f) >= 0
    def sizeBytes: Long = 16L + 4L * fps.length
  }
  final case class DenseFps(bits: Array[Long]) extends FileFps {
    def contains(f: Int): Boolean = (bits(f >>> 6) & (1L << f)) != 0L
    def sizeBytes: Long = 16L + 8L * bits.length
  }
  object FileFps {
    /** Sparse→dense switchover: past this count the bitmap is smaller. */
    val DenseCutoff = 2048
    def of(sorted: Array[Int]): FileFps =
      if (sorted.length < DenseCutoff) SparseFps(sorted)
      else {
        val bits = new Array[Long](1024)
        sorted.foreach(f => bits(f >>> 6) |= 1L << f)
        DenseFps(bits)
      }
  }

  /** Driver-resident auto-prune state for one registered table: per-file
    * capped membership summaries ([[FileFps]]), keyed by canonical file
    * path. */
  final case class AutoIndex(keyCol: String,
      fileFps: Map[String, FileFps]) {
    def nFiles: Int = fileFps.size
    /** Total resident bytes of the summaries + path strings — the number
      * a capacity plan reads (bounded by files × (8 KB + path)). */
    def residentBytes: Long =
      fileFps.iterator.map { case (p, s) => 40L + 2L * p.length + s.sizeBytes }.sum
    /** Canonical paths of files that may contain `value` — same
      * fingerprint function as [[build]], evaluated on the literal via
      * the identical catalyst XxHash64, so driver and executor agree
      * bit-for-bit. */
    def candidateFiles(value: Any, dt: org.apache.spark.sql.types.DataType): Set[String] = {
      val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal(value, dt)))
        .eval(null).asInstanceOf[Long]
      val f = (h & 65535L).toInt
      fileFps.collect { case (path, fps) if fps.contains(f) => path }.toSet
    }
  }

  private val autoIndexes =
    new java.util.concurrent.ConcurrentHashMap[String, AutoIndex]()

  private def canonDir(p: org.apache.hadoop.fs.Path): String = p.toUri.getPath

  /** Build the index for `tableDir` and register it with the
    * [[graft.plans.ConsultSkippingIndex]] optimizer rule: from here on,
    * every `keyCol = literal` scan over the table reads only candidate
    * files — no manual [[lookup]] call. Re-run after rewriting the table
    * (stale file names would prune everything). Returns files indexed. */
  def enableAutoPrune(spark: SparkSession, tableDir: String,
      keyCol: String): Int = {
    val entries = build(spark, tableDir, keyCol).collect().map { r =>
      canonDir(new org.apache.hadoop.fs.Path(r.getString(0))) ->
        FileFps.of(r.getSeq[Int](1).toArray)
    }.toMap
    autoIndexes.put(
      canonDir(new org.apache.hadoop.fs.Path(tableDir)),
      AutoIndex(keyCol, entries))
    entries.size
  }

  def disableAutoPrune(tableDir: String): Unit =
    autoIndexes.remove(canonDir(new org.apache.hadoop.fs.Path(tableDir)))

  /** The registered index for a scan root, if any. */
  def autoIndexOf(root: org.apache.hadoop.fs.Path): Option[AutoIndex] =
    Option(autoIndexes.get(canonDir(root)))

  /** One-scan index build: (file, fps[], n_rows) per data file. */
  def build(spark: SparkSession, tableDir: String, keyCol: String): DataFrame =
    spark.read.parquet(tableDir)
      .select(col("_metadata.file_path").as("file"), fp(col(keyCol)).as("fp"))
      .groupBy("file")
      .agg(sort_array(collect_set(col("fp"))).as("fps"),
        count(lit(1)).as("n_rows"))

  /** Incremental index maintenance: scan ONLY files not yet indexed and
    * drop rows for files that no longer exist (compaction/delete retired
    * them). Per-file summaries are independent, so the refreshed index is
    * IDENTICAL to a from-scratch [[build]] — at 100 TB a daily refresh
    * prices at the day's new files, never the table. */
  def refresh(spark: SparkSession, tableDir: String, keyCol: String,
      index: DataFrame): DataFrame = {
    val live = spark.read.parquet(tableDir)
      .select(col("_metadata.file_path").as("file")).distinct()
    val kept = index.join(live, Seq("file"), "left_semi")
    val newFiles = live.join(index.select("file"), Seq("file"), "left_anti")
      .collect().map(_.getString(0))
    if (newFiles.isEmpty) kept
    else kept.unionByName(
      spark.read.option("basePath", tableDir).parquet(newFiles.toIndexedSeq: _*)
        .select(col("_metadata.file_path").as("file"), fp(col(keyCol)).as("fp"))
        .groupBy("file")
        .agg(sort_array(collect_set(col("fp"))).as("fps"),
          count(lit(1)).as("n_rows")))
  }

  /** Index rows whose file may contain `value` (no false negatives). */
  def candidateFiles(index: DataFrame, value: Column): DataFrame =
    index.filter(array_contains(col("fps"), fp(value)))

  /** Exact point lookup reading only candidate files. Returns the rows
    * with `keyCol === value`; equals the full-scan filter by construction
    * (membership summaries have no false negatives). */
  def lookup(spark: SparkSession, tableDir: String, index: DataFrame,
      keyCol: String, value: Column): DataFrame = {
    val files = candidateFiles(index, value)
      .select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      // No candidate file: the key is provably absent — an empty result
      // with the table's schema, zero files read.
      spark.read.parquet(tableDir).filter(lit(false))
    else
      // basePath keeps Hive-style partition columns in the schema when
      // reading an explicit file list — without it a partitioned table's
      // partition columns silently vanish and the lookup's schema diverges
      // from the full-table read (or a lookup ON a partition column fails).
      spark.read.option("basePath", tableDir).parquet(files.toIndexedSeq: _*)
        .filter(col(keyCol) === value)
  }
}
