package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declared semantics of the reference medallion pipeline, as composable
  * batch `DataFrame => DataFrame` transforms. The streaming layer
  * ([[graft.streaming.Medallion]]) applies these same transforms inside
  * `readStream`/`writeStream`, so batch oracle checks and the streaming
  * pipeline share one definition of the semantics.
  *
  * Reference provenance (see SURVEY.md §2):
  *   - raw schema: `00_utils.py:30-36` (declared but unused there; here it
  *     is authoritative — schema inference is non-deterministic).
  *   - parse + quality gate + quarantine split: `01_bronze_layer_ingestion.py:32-60`.
  *   - dedup by log_id: `02_silver_layer_processing.py:19-23` (batch analog:
  *     deterministic keep-first; streaming analog: dropDuplicatesWithinWatermark).
  *   - geo enrichment: `02_silver_layer_processing.py:26` re-expressed as a
  *     broadcast dimension join (the reference's own production note,
  *     `00_utils.py:39-40`) instead of an optimizer-opaque UDF.
  *   - gold aggregation: declared semantics of `03_gold_layer_aggregation.py:21-31`
  *     with the rank-filter bug resolved (SURVEY §2.4 bug #1): total over ALL
  *     rows, region = argmax of per-region watch time, ties → lexicographically
  *     smallest region.
  *
  * Scale notes: the gate is shuffle-free map work; dedup is one shuffle on
  * `log_id`; enrichment broadcasts a bounded 764-row dimension; gold is two
  * shuffles (by (user, region), then by user) with partial aggregation.
  */
object ActivityPipeline {

  /** Raw input schema (reference `00_utils.py:30-36`), parenthesized column
    * name included — renamed at parse time exactly like the reference. */
  val RawSchema: StructType = StructType(Seq(
    StructField("log_id", StringType),
    StructField("user_id", StringType),
    StructField("timestamp", StringType),
    StructField("ip_address", StringType),
    StructField("watch_time(min)", LongType)))

  /** Canonical parsed (bronze) schema (`01_bronze_layer_ingestion.py:54-60`). */
  val ParsedSchema: StructType = StructType(Seq(
    StructField("log_id", StringType),
    StructField("user_id", StringType),
    StructField("timestamp", TimestampType),
    StructField("ip_address", StringType),
    StructField("watch_time", DoubleType)))

  /** Silver = parsed + geo_region (`02_silver_layer_processing.py:26`). */
  val SilverSchema: StructType =
    StructType(ParsedSchema.fields :+ StructField("geo_region", StringType))

  /** Gold (declared semantics, `03_gold_layer_aggregation.py:29-31`). */
  val GoldSchema: StructType = StructType(Seq(
    StructField("user_id", StringType),
    StructField("total_watch_time", DoubleType),
    StructField("geo_region", StringType)))

  /** Rename + parse (P1–P3): `watch_time(min)`→`watch_time`, string→timestamp
    * (null on failure — `try_to_timestamp`, matching the reference's
    * pre-ANSI `to_timestamp` behavior), long→double. */
  def parseRaw(raw: DataFrame): DataFrame =
    raw
      .withColumnRenamed("watch_time(min)", "watch_time_raw")
      .withColumn("timestamp_parsed", expr("try_to_timestamp(`timestamp`)"))
      .withColumn("watch_time_parsed", col("watch_time_raw").cast(DoubleType))

  /** Validity predicate (P4, `01_bronze_layer_ingestion.py:39-45`). */
  val validCond: Column =
    col("log_id").isNotNull &&
      col("user_id").isNotNull &&
      col("timestamp_parsed").isNotNull &&
      col("watch_time_parsed").isNotNull &&
      col("watch_time_parsed") >= 0

  /** Valid branch: final parsed projection (P5, P8). */
  def bronzeValid(parsed: DataFrame): DataFrame =
    parsed
      .filter(validCond)
      .select(
        col("log_id"),
        col("user_id"),
        col("timestamp_parsed").as("timestamp"),
        col("ip_address"),
        col("watch_time_parsed").as("watch_time"))

  /** Quarantine branch (P6, P7: `01_bronze_layer_ingestion.py:49-51`).
    * `withClock=false` omits the wall-clock `processing_time` column so the
    * output is deterministic for the differential oracle; the streaming
    * sink uses `withClock=true`. */
  def bronzeQuarantine(parsed: DataFrame, withClock: Boolean = true): DataFrame = {
    val q = parsed
      .filter(!validCond)
      .withColumnRenamed("timestamp", "timestamp_raw")
      .withColumn("dq_reason",
        lit("Failed semantic validation: missing required fields or invalid format"))
      .select(col("log_id"), col("user_id"), col("timestamp_raw"),
        col("ip_address"), col("watch_time_raw"),
        col("timestamp_parsed"), col("watch_time_parsed"), col("dq_reason"))
    if (withClock) q.withColumn("processing_time", current_timestamp()) else q
  }

  /** Batch dedup by `log_id` with a deterministic keep rule (earliest
    * timestamp, full-column tiebreak) — the batch analog of the reference's
    * streaming `dropDuplicates(["log_id"])` (`02_silver_layer_processing.py:23`).
    * One shuffle on `log_id`; no driver-side state. */
  def dedup(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("log_id"))
      .orderBy(col("timestamp"), col("user_id"), col("ip_address"), col("watch_time"))
    bronze
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Geo enrichment as a broadcast dimension join + `coalesce(…, 'Unknown')`
    * — optimizer-transparent replacement for the reference's dict UDF
    * (`00_utils.py:41-57`): pushdown/pruning stay intact and the join
    * broadcasts a bounded 764-row table at any scale. */
  def enrich(silver: DataFrame): DataFrame = {
    val dim = broadcast(
      IpRegionDim.frame(silver.sparkSession).withColumnRenamed("ip", "ip_address"))
    silver
      .join(dim, Seq("ip_address"), "left")
      .withColumn("geo_region", coalesce(col("geo_region"), lit("Unknown")))
      .select(col("log_id"), col("user_id"), col("timestamp"),
        col("ip_address"), col("watch_time"), col("geo_region"))
  }

  /** Gold aggregation, declared semantics (SURVEY §2.4):
    * `total_watch_time` = exact-decimal sum over ALL the user's rows;
    * `geo_region` = argmax of per-region watch time, ties broken by the
    * lexicographically smallest region. Two shuffles, both with map-side
    * partial aggregation; the window runs on the already-aggregated
    * (user, region) rows (≤ #regions per user), never on raw events. */
  def gold(enriched: DataFrame): DataFrame =
    goldFromByRegion(byRegion(enriched))

  /** Stage 1: per-(user, region) exact-decimal sums — also the merge key of
    * the incremental gold state (commutative, so increments can be unioned
    * and re-summed). */
  def byRegion(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(col("user_id"), col("geo_region"))
      .agg(sum(col("watch_time").cast(DecimalType(30, 6))).as("wt"))

  /** Stage 2: finalize gold from (user, region, wt) partial sums. */
  def goldFromByRegion(br: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("wt").desc, col("geo_region").asc)
    br
      .withColumn("__rn", row_number().over(w))
      .withColumn("total_dec", sum(col("wt")).over(Window.partitionBy(col("user_id"))))
      .filter(col("__rn") === 1)
      .select(
        col("user_id"),
        col("total_dec").cast(DoubleType).as("total_watch_time"),
        col("geo_region"))
  }

  /** Full batch composition raw→gold (also the per-trigger recompute plan
    * used by the streaming gold sink's foreachBatch). */
  def goldFromRaw(raw: DataFrame): DataFrame =
    gold(enrich(dedup(bronzeValid(parseRaw(raw)))))
}
