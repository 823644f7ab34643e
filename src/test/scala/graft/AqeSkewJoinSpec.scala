package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling, exercised: GraftSession turns AQE skew-join on,
  * and [[graft.operators.Skew]] documents salting as the manual fallback —
  * this spec proves the AUTOMATIC path actually fires. A join with one hot
  * key (half the left side) runs as a shuffle SMJ under test-scale skew
  * thresholds; after execution the adaptive final plan must carry the
  * skew=true marker (the hot partition was split into advisory-sized
  * chunks at runtime), and the result must equal the broadcast-join
  * reference — splitting changes scheduling, never semantics. */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition at runtime and preserves the result") {
    val s = spark
    import s.implicits._
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(s.conf.get(k)).toOption)
    try {
      s.conf.set(keys(0), "65536")
      s.conf.set(keys(1), "2")
      s.conf.set(keys(2), "16384")
      s.conf.set(keys(3), "-1") // force the shuffle-join path
      // Half the probe side lands on key 7 — one partition ~1.6 MB against
      // a 64 KB skew threshold.
      val left = s.range(0, 200000).select(
        when($"id" % 2 === 0, lit(7L)).otherwise($"id").as("k"),
        $"id".as("v"))
      val right = s.range(0, 1000).select($"id".as("k2"),
        concat(lit("p"), $"id").as("payload"))
      val joined = left.join(right, $"k" === $"k2")
      // Execute THIS DataFrame's plan (count() would build a separate
      // aggregate tree and leave this one un-run / isFinalPlan=false).
      val n = joined.collect().length.toLong
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
      val expected = left.join(broadcast(right), $"k" === $"k2").count()
      assert(n === expected, "skew-split join changed the result")
      assert(n > 100000L, "hot key did not dominate as intended")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
