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

  test("union of two watermarked sources advances on the SLOWEST source") {
    // The global watermark of a multi-source query is the MIN across
    // sources: a window may only finalize once EVERY input has moved past
    // it — a fast source must never flush results a lagging source could
    // still contribute to. This is the semantics that makes multi-topic /
    // multi-landing-zone ingestion correct, and the operational reason a
    // dead source stalls a pipeline (monitor per-source watermarks).
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val fast = MemoryStream[(java.sql.Timestamp, Double)]
    val slow = MemoryStream[(java.sql.Timestamp, Double)]
    // Watermark PER BRANCH, then union: each source tracks its own event
    // time and the query's global watermark is their MIN. (A single
    // withWatermark after the union would track the combined max — the
    // fast source would drag the watermark forward for both.)
    val unioned = fast.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .unionAll(slow.toDF().toDF("ts", "value")
        .withWatermark("ts", "10 minutes"))
      .groupBy(window($"ts", "10 minutes"))
      .agg(sum($"value").as("total"))
    val q = unioned.writeStream.format("memory").queryName("union_wm_out")
      .outputMode("append").start()
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    def windows(): Set[String] = spark.table("union_wm_out")
      .select(date_format($"window.start", "HH:mm").as("w"))
      .as[String].collect().toSet
    try {
      fast.addData((t("2024-01-01 00:01:00"), 1.0))
      slow.addData((t("2024-01-01 00:02:00"), 2.0))
      q.processAllAvailable()
      // Fast source races an hour ahead; slow source is silent. The
      // 00:00 window must NOT finalize — min(watermarks) is still 00:00.
      fast.addData((t("2024-01-01 01:30:00"), 5.0))
      q.processAllAvailable()
      assert(windows().isEmpty,
        "window finalized while the slow source could still contribute")
      // The slow source catches up past 00:10+delay → now it finalizes,
      // with BOTH sources' rows included.
      slow.addData((t("2024-01-01 01:30:00"), 7.0))
      q.processAllAvailable()
      fast.addData((t("2024-01-01 03:00:00"), 0.5)) // push further
      slow.addData((t("2024-01-01 03:00:00"), 0.5))
      q.processAllAvailable()
      val out = spark.table("union_wm_out")
        .select(date_format($"window.start", "HH:mm").as("w"), $"total")
        .as[(String, Double)].collect().toMap
      assert(out.get("00:00").contains(3.0),
        s"finalized window must hold both sources' rows: $out")
    } finally q.stop()
  }

  test("chained stateful operators: dedup then windowed agg in ONE query") {
    // Spark 3.4+ supports multiple stateful operators in one append-mode
    // query with correct watermark propagation between them — here the
    // silver dedup and a gold-style windowed aggregate run as a SINGLE
    // streaming plan (the medallion splits them across layer queries for
    // operational reasons, not engine limits; this pins that the fused
    // form is available and correct).
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val fused = mem.toDF().toDF("log_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("log_id")
      .groupBy(window($"ts", "10 minutes"))
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
    val q = fused.writeStream.format("memory").queryName("fused_out")
      .outputMode("append").start()
    def t(s0: String) = java.sql.Timestamp.valueOf(s0)
    try {
      // Duplicate log_id in the same window: only one copy may aggregate.
      mem.addData(
        ("a", t("2024-01-01 00:01:00"), 10.0),
        ("a", t("2024-01-01 00:02:00"), 10.0), // dup, suppressed by stage 1
        ("b", t("2024-01-01 00:03:00"), 5.0))
      q.processAllAvailable()
      // Duplicate arriving in a LATER batch must also be suppressed before
      // it reaches the aggregate.
      mem.addData(("b", t("2024-01-01 00:04:00"), 99.0))
      q.processAllAvailable()
      // Advance the watermark far enough to finalize the 00:00 window
      // through BOTH stateful stages.
      mem.addData(("z", t("2024-01-01 01:00:00"), 1.0))
      q.processAllAvailable()
      mem.addData(("z2", t("2024-01-01 02:00:00"), 1.0))
      q.processAllAvailable()

      val out = spark.table("fused_out")
        .select(date_format($"window.start", "HH:mm").as("w"), $"total", $"n")
        .as[(String, Double, Long)].collect()
        .map { case (w, tot, n) => w -> ((tot, n)) }.toMap
      assert(out.get("00:00").contains((15.0, 2L)),
        s"dedup did not gate the windowed aggregate: $out")
      // Both stateful operators must be live in one query.
      val states = q.lastProgress.stateOperators.map(_.operatorName).toSeq
      assert(states.exists(_.contains("dedupe")) &&
        states.exists(_.contains("stateStoreSave")), // the streaming agg
        s"expected two stateful operators in one query, got: $states")
    } finally q.stop()
  }
}
