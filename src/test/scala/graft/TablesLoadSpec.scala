package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Tables.load must normalize every events.ts fixture encoding seen across
  * fixture generations to the same session-TZ (UTC) micros TimestampType:
  *   - nanos LONG (how Spark reads TIMESTAMP(NANOS) under
  *     spark.sql.legacy.parquet.nanosAsLong)
  *   - timestamp[us] without tz (TIMESTAMP_NTZ — current driver fixtures)
  *   - timestamp[us] with tz (what Spark itself writes for TimestampType)
  */
class TablesLoadSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private val us = Seq(
    1704067200000000L, // 2024-01-01T00:00:00Z
    1704067200123456L, // sub-second micros survive
    1706745599999999L) // 2024-01-31T23:59:59.999999Z

  private def writeAndLoad(dir: String)(write: String => Unit): Seq[Long] = {
    write(dir)
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"expected TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
  }

  test("nanos-long encoding divides to micros") {
    val dir = tempDir("tl-long")
    val got = writeAndLoad(dir) { d =>
      us.map(_ * 1000L).toDF("ts").withColumn("event_id", lit(1L))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got == us.sorted)
  }

  test("timestamp_ntz encoding reinterprets wall clock as UTC") {
    val dir = tempDir("tl-ntz")
    val got = writeAndLoad(dir) { d =>
      us.toDF("u")
        .select(timestamp_micros($"u").cast("timestamp_ntz").as("ts"),
          lit(1L).as("event_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got == us.sorted)
  }

  test("tz-aware timestamp encoding passes through") {
    val dir = tempDir("tl-ts")
    val got = writeAndLoad(dir) { d =>
      us.toDF("u")
        .select(timestamp_micros($"u").as("ts"), lit(1L).as("event_id"))
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    assert(got == us.sorted)
  }
}
