package graft.sources

import graft.api.{Exact, QueryModule, QuerySpec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet and CSV: JSON-lines and ORC
  * round trips. Each entry writes a deterministic projection of `events` in
  * the format under test, reads it back with an explicit schema (inference
  * is never trusted), aggregates, and must match the oracle computed from
  * the original table — so a lossy or misread round trip cannot hash-match.
  */
object SourceFormats extends QueryModule {

  private val schema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def scratch(name: String): String = graft.api.Scratch.dir(name)

  private def roundtrip(s: SparkSession, dir: String, format: String): DataFrame = {
    val tmp = scratch(s"fmt_$format")
    Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"), col("props"))
      .write.format(format).mode("overwrite").save(tmp)
    s.read.schema(schema).format(format).load(tmp)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum(col("value")).as("total"),
        countDistinct(col("event_id")).as("n_ids"))
  }

  private val oracle = s"""
    SELECT event_type, COUNT(*) AS n, ${Exact.sqlSum("value")} AS total,
           COUNT(DISTINCT event_id) AS n_ids
    FROM events GROUP BY event_type"""

  def queries: Map[String, QuerySpec] = Map(
    "src_jsonl_roundtrip" -> QuerySpec(
      fn = (s, dir) => roundtrip(s, dir, "json"),
      oracle = Some(oracle)),
    "src_orc_roundtrip" -> QuerySpec(
      fn = (s, dir) => roundtrip(s, dir, "orc"),
      oracle = Some(oracle)),

    // Compressed text-format round trip (gzip CSV). Whole-file codecs are
    // NOT splittable — one gzip stream = one read task — so at scale
    // parallelism must come from file COUNT, which the per-task write
    // already provides; the read is as parallel as the write was. Quoted
    // props (JSON carrying commas/quotes) exercise the quoting path both
    // directions; the schema is declared, never inferred.
    "src_csv_gzip_roundtrip" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_csv_gz")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"), col("props"))
          .write.option("compression", "gzip").mode("overwrite").csv(tmp)
        s.read.schema(schema).csv(tmp)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            Exact.dsum(col("value")).as("total"),
            countDistinct(col("event_id")).as("n_ids"))
      },
      oracle = Some(oracle)),

    // Hive-style partitioned parquet layout: write `events` partitioned by
    // event_type, read back with a partition predicate. The filter prunes
    // at the DIRECTORY level (PartitionFilters in the scan, zero IO for
    // excluded partitions) — the layout decision that turns a 100 TB full
    // scan into reading only the partitions a query names. The oracle is
    // the same aggregate over the unpartitioned original, so a partition
    // mis-write (lost rows, misassigned directory) hash-fails; PlanAssert
    // pins the pruning itself.
    "src_parquet_partitioned" -> QuerySpec(
      fn = (s, dir) => {
        val tmp = scratch("fmt_parquet_part")
        Tables.load(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
          .write.partitionBy("event_type").mode("overwrite").parquet(tmp)
        s.read.parquet(tmp)
          .filter(col("event_type").isin("click", "purchase"))
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            Exact.dsum(col("value")).as("total"),
            countDistinct(col("event_id")).as("n_ids"))
      },
      oracle = Some(s"""
        SELECT event_type, COUNT(*) AS n, ${Exact.sqlSum("value")} AS total,
               COUNT(DISTINCT event_id) AS n_ids
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type""")))
}
