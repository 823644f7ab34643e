package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: the oracle-checked query emits error-bound booleans
  * (each engine checks its own sketch); this spec bounds the RAW relative
  * error tighter on the Spark side, so a degrading sketch fails here before
  * it ever widens past the query's 10% gate. */
class ApproxAggSpec extends SparkSpec {

  test("approx distinct count and percentile stay within tolerance of exact") {
    val rows = SparkEntry.queries("rel_agg_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_10pct"), s"HLL out of bound: $r")
      assert(r.getAs[Boolean]("median_within_10pct"), s"percentile out of bound: $r")
    }

    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median"),
        median(col("l_extendedprice")).as("exact_median"))
      .collect()
    raw.foreach { r =>
      val approxParts = r.getAs[Long]("approx_parts").toDouble
      val exactParts = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approxParts - exactParts) / exactParts < 0.05,
        s"HLL error too large: $approxParts vs $exactParts")
      val approxMed = r.getAs[Double]("approx_median")
      val exactMed = r.getAs[Double]("exact_median")
      assert(math.abs(approxMed - exactMed) / exactMed < 0.05,
        s"percentile error too large: $approxMed vs $exactMed")
    }
  }
}
