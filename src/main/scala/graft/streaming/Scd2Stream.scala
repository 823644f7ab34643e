package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming SCD Type-2 dimension maintenance: a changelog stream (orders
  * as change events) keeps a versioned dimension table current via
  * `foreachBatch` — the MERGE-shaped pattern the medallion gold layer uses
  * for dimensions rather than aggregates.
  *
  * Incrementality: each batch touches ONLY the keys it contains. The
  * stored versions of those keys ARE the compressed change log (valid_from
  * + attribute + the opening change id), so re-deriving a touched key =
  * re-running change detection over its stored versions ∪ the batch's new
  * events — O(touched history), never a table-wide recompute. Untouched
  * keys are carried over untouched.
  *
  * Ordering contract (documented, standard for CDC logs): a key's events
  * arrive in event-time order ACROSS batches. Within a batch any order is
  * fine (the window sorts); a cross-batch late event would need the
  * dropped non-change events to re-derive exactly, which the compressed
  * log no longer has — the same contract a warehouse MERGE pipeline runs
  * under. `Scd2StreamSpec` proves the maintained table equals the batch
  * `rel_scd2` operator on the full log.
  *
  * At scale the rewrite is per-partition (hash(k) directory swap — see
  * streaming/Maintenance.scala's crash-safe protocol); locally the spec
  * table is small and rewritten whole.
  */
object Scd2Stream {

  final case class OrderCdc(
      o_custkey: Long,
      o_orderdate: java.sql.Timestamp,
      o_orderkey: Long,
      o_orderpriority: String)

  /** Stored dimension schema: one row per (key, version). */
  private val tableCols =
    Seq("k", "prio", "valid_from", "valid_to", "opened_by")

  /** Re-derive SCD2 rows from a change-event relation
    * (k, t, oid, prio): change detection (lag) + interval close (lead) —
    * the exact logic of the batch `rel_scd2` operator, one shuffle. */
  private def derive(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("oid"))
    events
      .withColumn("prev", lag(col("prio"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("prio"))
      .withColumn("valid_to", lead(col("t"), 1).over(w))
      .select(col("k"), col("prio"), col("t").as("valid_from"),
        col("valid_to"), col("oid").as("opened_by"))
  }

  /** Merge one micro-batch of change events into the dimension at
    * `tableDir`. */
  def applyBatch(spark: SparkSession, batch: DataFrame, tableDir: String): Unit = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val tablePath = new org.apache.hadoop.fs.Path(tableDir)
    val fs = tablePath.getFileSystem(hadoopConf)
    val stagedPath = new org.apache.hadoop.fs.Path(tableDir + ".staging")
    val retiredPath = new org.apache.hadoop.fs.Path(tableDir + ".retired")
    // Crash recovery FIRST — even for an empty batch: a missing table next
    // to a COMPLETE staging dir means the previous batch died between its
    // two renames, and the publish must finish before anyone reads.
    if (!fs.exists(tablePath) &&
        fs.exists(new org.apache.hadoop.fs.Path(stagedPath, "_SUCCESS"))) {
      require(fs.rename(stagedPath, tablePath),
        s"could not recover staged dimension generation into $tablePath")
    }

    val events = batch.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      col("o_orderkey").as("oid"), col("o_orderpriority").as("prio"))
    if (events.isEmpty) return

    val existing: Option[DataFrame] =
      if (fs.exists(tablePath)) Some(spark.read.parquet(tableDir))
      else None

    val merged = existing match {
      case None => derive(events)
      case Some(table) =>
        val keys = events.select("k").distinct()
        val untouched = table.join(keys, Seq("k"), "left_anti")
        // A touched key's stored versions are its compressed change log:
        // replay them (valid_from/opened_by as the event identity) with
        // the new batch events through the same derivation.
        val replay = table.join(keys, Seq("k"), "left_semi")
          .select(col("k"), col("valid_from").as("t"),
            col("opened_by").as("oid"), col("prio"))
        untouched.unionByName(derive(replay.unionByName(events)))
    }

    // The merged plan READS the table it replaces, so the rewrite must
    // fully materialize before the old generation disappears: stage to a
    // sibling dir (a real write, not a cache — cache eviction under
    // memory pressure would re-read deleted inputs), then swap via
    // renames. A crash between the renames leaves either the old or the
    // new generation; the checkpointed batch replays idempotently. At
    // partitioned scale this is Maintenance.compactPartition's manifest
    // protocol per touched partition.
    fs.delete(stagedPath, true)
    fs.delete(retiredPath, true)
    merged.select(tableCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(stagedPath.toString)
    if (fs.exists(tablePath)) require(fs.rename(tablePath, retiredPath),
      s"could not retire previous dimension generation at $tablePath")
    require(fs.rename(stagedPath, tablePath),
      s"could not publish new dimension generation to $tablePath")
    fs.delete(retiredPath, true)
  }

  /** Run the maintenance stream over a changelog source. */
  def run(changes: Dataset[OrderCdc], tableDir: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[OrderCdc], _: Long) =>
        applyBatch(batch.sparkSession, batch.toDF(), tableDir)
      }
      .start()
}
