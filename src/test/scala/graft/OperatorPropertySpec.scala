package graft

import org.apache.spark.sql.functions._

/** Semantic properties of round-4 operators that the hash oracle alone
  * doesn't make obvious. */
class OperatorPropertySpec extends SparkSpec {

  test("rel_zorder blocks are locality-bounded in BOTH dimensions") {
    // z >> 24 leaves 12 free interleaved bits per dimension, so within any
    // block each dimension spans < 2^12 of the 2^16 NORMALIZED domain —
    // 1/16 of the dimension's actual value range, whatever its scale (the
    // range normalization is what keeps this true when custkey outgrows
    // 16 bits). That per-block tightness in BOTH dimensions is what makes
    // min/max skipping effective on either predicate; a lexicographic
    // sort would bound only the leading column.
    val o = graft.sources.Tables.load(spark, sfDir, "orders")
    import org.apache.spark.sql.functions.{datediff, to_date, lit, min, max, col}
    val st = o.withColumn("day_nr",
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01"))))
      .agg(min("o_custkey"), max("o_custkey"), min("day_nr"), max("day_nr"))
      .head()
    def rng(lo: Int, hi: Int) =
      st.getAs[Number](hi).longValue - st.getAs[Number](lo).longValue
    def bound(range: Long): Long = (4096.0 * range / 65535.0).ceil.toLong + 1
    val (custBound, dayBound) = (bound(rng(0, 1)), bound(rng(2, 3)))
    val blocks = SparkEntry.queries("rel_zorder")(spark, sfDir).collect()
    assert(blocks.nonEmpty)
    blocks.foreach { r =>
      val custSpan = r.getAs[Number]("max_cust").longValue - r.getAs[Number]("min_cust").longValue
      val daySpan  = r.getAs[Number]("max_day").longValue - r.getAs[Number]("min_day").longValue
      assert(custSpan <= custBound && daySpan <= dayBound,
        s"block ${r.get(0)} spans cust=$custSpan (bound $custBound) " +
          s"day=$daySpan (bound $dayBound) — locality broken")
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
