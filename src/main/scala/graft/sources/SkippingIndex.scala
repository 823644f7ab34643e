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
