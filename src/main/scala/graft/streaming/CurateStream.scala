package graft.streaming

import graft.llm.Dedup
import graft.sources.SortedRunIndex
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming corpus ingestion with INCREMENTAL near-dup dedup — the
  * operational shape of training-data curation at 100 TB, where each day's
  * increment must dedup against everything already ingested WITHOUT
  * re-deduping the corpus.
  *
  * Per micro-batch (checkpointed foreachBatch):
  *   1. quality gate — language allowlist + length bounds (the
  *      ActivityPipeline bronze-gate pattern applied to documents);
  *   2. incremental LSH dedup — [[Dedup.incrementPairs]] joins the batch
  *      against the PERSISTED band index (and itself), so per-batch work
  *      scales with the increment, never the corpus;
  *   3. state append — the batch's bands / shingle sets / accepted docs /
  *      discovered pairs land under `batch=<id>` subdirectories, so a
  *      REPLAYED batch (post-crash) overwrites its own output instead of
  *      double-appending: exactly-once state without a transaction log.
  *
  * Because LSH is a pure per-document function, accumulated pairs ≡ a
  * from-scratch dedup of the full corpus (the [[Dedup.incrementPairs]]
  * invariant, asserted by DedupSpec), so [[survivors]] — one label pass
  * over the accumulated pair set + one anti-join — equals the BATCH
  * [[Dedup.keepSet]] of everything ingested, regardless of arrival order
  * or batch boundaries. CurateStreamSpec proves that equality end-to-end
  * across waves and a checkpoint restart.
  *
  * Scale posture: the persisted band/set state lives in a
  * [[graft.sources.SortedRunIndex]] (sorted runs + per-file key-range
  * manifest + delta zone), so a batch's dedup probe READS only the run
  * files its own band hashes intersect — O(increment) IO per batch where
  * a flat layout re-scans the whole index (round-11's measured
  * 0.98 → 5.89 s drift for a fixed 100-doc increment). [[maintain]]
  * (run after each drain) folds deltas into the runs; the label
  * recompute runs over PAIRS (≪ corpus — only near-dup members appear);
  * survivors is an anti-join of the corpus against the tiny
  * non-representative set. Nothing here rereads or reshuffles previously
  * ingested text.
  */
object CurateStream {

  /** Raw landing schema for the document stream. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  final case class GateConfig(
      langs: Seq[String] = Seq("en", "fr", "es", "de", "zh"),
      minChars: Long = 1L,
      maxChars: Long = Long.MaxValue)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new org.apache.hadoop.fs.Path(dir))

  private def readOr(spark: SparkSession, dir: String, empty: => DataFrame): DataFrame =
    if (exists(spark, dir)) spark.read.parquet(dir) else empty

  /** Apply one micro-batch: gate → incremental dedup → idempotent state
    * append. Public so a non-streaming orchestrator (e.g. a daily batch
    * job) can drive the identical logic. */
  def applyBatch(batch: DataFrame, batchId: Long, stateDir: String,
      gate: GateConfig = GateConfig()): Unit = {
    val spark = batch.sparkSession
    val accepted = batch
      .filter(col("lang").isin(gate.langs: _*) &&
        col("n_chars").between(gate.minChars, gate.maxChars))
      .select(col("doc_id"), lower(col("text")).as("text"), col("lang"))
    if (accepted.isEmpty) return
    // The batch is read three times (bands, sets, pairs legs) from a
    // streaming source that cannot be re-scanned — materialize it once.
    accepted.persist()
    try {
      // Micro-batches are bounded (source admission caps), so the
      // increment broadcasts — and the persisted band/set state lives in
      // a SortedRunIndex, so the probe reads only the run files whose key
      // ranges the increment's band hashes (then the candidates' doc ids)
      // intersect: per-batch IO is O(increment), never O(index).
      val newPairs = Dedup.incrementPairsIndexed(
        accepted.select("doc_id", "text"), stateDir)
      // batch=<id> subdirs: a replayed batch overwrites its own output.
      def put(df: DataFrame, name: String): Unit =
        df.write.mode(SaveMode.Overwrite)
          .parquet(s"$stateDir/$name/batch=$batchId")
      put(newPairs.select("doc_a", "doc_b", "jaccard"), "pairs")
      SortedRunIndex.append(
        Dedup.bandsOf(accepted.select("doc_id", "text")),
        s"$stateDir/bands", batchId)
      SortedRunIndex.append(
        Dedup.setsOf(accepted.select("doc_id", "text")),
        s"$stateDir/sets", batchId)
      put(accepted.select("doc_id", "lang"), "docs")
    } finally accepted.unpersist()
  }

  /** File granularity of the compacted band/set runs — the probe-cost
    * unit (a probe key drags in at most one run file). Sized for
    * micro-batch increments: a 100-doc batch probes ≤ 3,200 band hashes
    * → ≤ 3,200 × [[bandRowsPerFile]] rows whatever the index size. A
    * deployment ingesting ~100k-doc increments would raise these to ~1M
    * rows (≈ 100 MB files) — same math, warehouse-sized files. */
  val bandRowsPerFile = 2048
  val setRowsPerFile = 512

  /** Fold accumulated band/set deltas into their sorted runs — the
    * maintenance that keeps probe cost flat. `keepLast = 1` leaves the
    * newest, still-replayable micro-batch in the delta zone (the
    * [[graft.llm.MmFeatures.compactBatches]] replay-safety argument).
    * Returns (band deltas folded, set deltas folded). */
  def maintain(spark: SparkSession, stateDir: String,
      keepLast: Int = 1): (Int, Int) = {
    val (b, _) = SortedRunIndex.compact(
      spark, s"$stateDir/bands", "bh", bandRowsPerFile, keepLast)
    val (s, _) = SortedRunIndex.compact(
      spark, s"$stateDir/sets", "doc_id", setRowsPerFile, keepLast)
    (b, s)
  }

  /** The current keep set: every ingested doc that is not a
    * non-representative member of a near-dup cluster over the ACCUMULATED
    * pair set — identical to batch [[Dedup.keepSet]] on the full corpus. */
  def survivors(spark: SparkSession, stateDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$stateDir/docs")
    val pairs = readOr(spark, s"$stateDir/pairs",
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("doc_a", LongType),
          StructField("doc_b", LongType)))))
    Dedup.keepSet(docs, pairs.select("doc_a", "doc_b"))
  }

  /** Drain everything currently in `landingDir` through the curation
    * pipeline (one wave); restarts resume from the checkpoint. */
  def runAvailableNow(spark: SparkSession, landingDir: String,
      stateDir: String, checkpointDir: String,
      gate: GateConfig = GateConfig(),
      maxFilesPerTrigger: Int = 10,
      maintainAfterDrain: Boolean = true): Unit = {
    val q: StreamingQuery = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, stateDir, gate)
      }
      .start()
    q.awaitTermination()
    // Post-drain maintenance: fold this wave's deltas into the sorted
    // runs so the NEXT wave's probes stay flat. The drained stream has
    // committed past every folded batch, so a restart can only replay
    // the kept-out newest delta (keepLast = 1).
    if (maintainAfterDrain) maintain(spark, stateDir)
  }
}
