package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    // events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as a nanos
    // long (spark.sql.legacy.parquet.nanosAsLong). Normalize to a micros
    // TimestampType (floor division — matches DuckDB's ns→µs truncation).
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view so queries can use spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
