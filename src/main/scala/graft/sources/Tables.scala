package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the deterministic test tables (see TESTDATA.md / FIXTURES.md).
  *
  * All loads are plain parquet scans so Catalyst keeps full pushdown/pruning
  * freedom — callers express filters and projections declaratively and the
  * scan reads only what is needed (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize events.ts to a session-TZ (UTC) micros TimestampType whatever
    // the fixture encoding is. Observed encodings across fixture generations:
    //   - TIMESTAMP(NANOS) → read as a nanos long under
    //     spark.sql.legacy.parquet.nanosAsLong → floor-divide to micros
    //     (matches DuckDB's ns→µs truncation)
    //   - timestamp[us] without tz → TIMESTAMP_NTZ → reinterpret the wall
    //     clock as UTC (session TZ is pinned UTC, so this is value-identical
    //     to what DuckDB reads natively)
    //   - timestamp[us] with tz → already TimestampType → pass through
    if (name == "events")
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      }
    else df
  }

  /** Register every table as a temp view so queries can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
