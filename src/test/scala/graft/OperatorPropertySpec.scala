package graft

import org.apache.spark.sql.functions._

/** Semantic properties of round-4 operators that the hash oracle alone
  * doesn't make obvious. */
class OperatorPropertySpec extends SparkSpec {

  test("rel_zorder blocks are locality-bounded in BOTH dimensions") {
    // z >> 14 leaves 7 free interleaved bits per dimension, so within any
    // block each dimension spans < 2^7 — the property that makes min/max
    // skipping effective on either predicate. A lexicographic sort would
    // bound only the leading column.
    val blocks = SparkEntry.queries("rel_zorder")(spark, sfDir).collect()
    assert(blocks.nonEmpty)
    blocks.foreach { r =>
      val custSpan = r.getAs[Number]("max_cust").longValue - r.getAs[Number]("min_cust").longValue
      val daySpan  = r.getAs[Number]("max_day").longValue - r.getAs[Number]("min_day").longValue
      assert(custSpan <= 127 && daySpan <= 127,
        s"block ${r.get(0)} spans cust=$custSpan day=$daySpan (locality broken)")
    }
    // Blocks partition the table: no rows lost or duplicated.
    val total = blocks.map(_.getAs[Number]("n").longValue).sum
    val expected = graft.sources.Tables.load(spark, sfDir, "orders").count()
    assert(total == expected, s"blocks cover $total of $expected rows")
  }

  test("ts_downsample_m4 keeps at most 4 rows per bucket including its extremes") {
    val out = SparkEntry.queries("ts_downsample_m4")(spark, sfDir)
    val perBucket = out.groupBy("event_type", "bucket").count().collect()
    assert(perBucket.forall(_.getAs[Long]("count") <= 4), "bucket emits > 4 rows")
    // The true min/max of every bucket must survive the decimation.
    val truth = graft.sources.Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("bucket"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    val kept = out.groupBy("event_type", "bucket")
      .agg(min("value").as("klo"), max("value").as("khi"))
    val joined = truth.join(kept, Seq("event_type", "bucket"), "left")
    assert(joined.filter(col("klo") =!= col("lo") || col("khi") =!= col("hi") ||
      col("klo").isNull).count() == 0, "an extreme was dropped by M4")
  }
}
