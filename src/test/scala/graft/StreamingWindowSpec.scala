package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming window semantics (SURVEY T1/T3/T4): the same `window()`
  * expression used by the batch ts_window_* queries, run under a watermark —
  * asserting that (a) windows finalize in append mode once the watermark
  * passes, and (b) data later than the watermark is dropped, not double
  * counted. */
class StreamingWindowSpec extends SparkSpec {

  test("watermarked tumbling window finalizes and drops late rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"))
      .agg(sum($"value").as("total"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      mem.addData((t("2024-01-01 00:01:00"), 1.0), (t("2024-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      // Advances the watermark to 00:50 → the 00:00 window finalizes.
      mem.addData((t("2024-01-01 01:00:00"), 5.0))
      q.processAllAvailable()
      // Later than the watermark → must be dropped silently.
      mem.addData((t("2024-01-01 00:02:00"), 100.0))
      q.processAllAvailable()
      // Pushes the watermark past 01:10 → the 01:00 window finalizes.
      mem.addData((t("2024-01-01 02:00:00"), 7.0))
      q.processAllAvailable()

      val out = spark.table("wm_out")
        .select(date_format($"window.start", "HH:mm").as("w"), $"total")
        .as[(String, Double)].collect().toMap
      assert(out("00:00") === 3.0, "late row leaked into a finalized window")
      assert(out("01:00") === 5.0)
      assert(!out.contains("02:00"), "open window emitted before watermark")
      // T3 observability: the drop is visible in the progress metrics.
      val dropped = q.recentProgress
        .flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1L, "late-row drop not reported in metrics")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = mem.toDF().toDF("log_id", "ts")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("log_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    try {
      mem.addData(("a", t("2024-01-01 10:00:00")), ("a", t("2024-01-01 10:01:00")),
        ("b", t("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // Same key again in a LATER micro-batch, still inside the watermark →
      // state must suppress it.
      mem.addData(("a", t("2024-01-01 10:30:00")), ("c", t("2024-01-01 10:31:00")))
      q.processAllAvailable()
      val keys = spark.table("dedup_out").groupBy("log_id").count()
        .as[(String, Long)].collect().toMap
      assert(keys === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
    } finally q.stop()
  }
}
