package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates have no cross-engine oracle; bound them against the
  * exact values computed in the same query instead. */
class ApproxAggSpec extends SparkSpec {

  test("approx distinct count and percentile stay within tolerance of exact") {
    val rows = SparkEntry.queries("rel_agg_approx")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
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
