package graft

import graft.streaming.Metrics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The metrics listener must report input rows, batch counts, and
  * later-than-watermark drops for a named query. */
class MetricsSpec extends SparkSpec {

  test("listener accumulates input and late-drop counters") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val listener = Metrics.attach(spark)
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes")).agg(sum($"value"))
    val q = agg.writeStream.format("memory").queryName("metrics_probe")
      .outputMode("append").start()
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    try {
      mem.addData((t("2024-01-01 00:01:00"), 1.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 01:00:00"), 2.0))
      q.processAllAvailable()
      mem.addData((t("2024-01-01 00:02:00"), 3.0)) // late → dropped
      q.processAllAvailable()
    } finally q.stop()
    spark.streams.removeListener(listener)

    // Listener delivery is async; poll briefly.
    var m = listener.snapshot.get("metrics_probe")
    val deadline = System.nanoTime() + 10e9.toLong
    while ((m.isEmpty || m.get.droppedByWatermark < 1) && System.nanoTime() < deadline) {
      Thread.sleep(100)
      m = listener.snapshot.get("metrics_probe")
    }
    assert(m.isDefined, "no metrics recorded for the query")
    assert(m.get.inputRows === 3L, s"input rows: ${m.get}")
    assert(m.get.droppedByWatermark >= 1L, s"late drop not counted: ${m.get}")
    assert(m.get.batches >= 3L)
  }

  test("Dataset.observe counters accumulate across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val listener = Metrics.attach(spark)
    val mem = MemoryStream[(Long, Double)]
    val observed = mem.toDF().toDF("id", "value")
      .observe("probe_gate",
        count(lit(1)).as("rows_seen"),
        sum(when($"value" > 0, 1).otherwise(0)).as("rows_positive"))
    val q = observed.writeStream.format("memory").queryName("observe_probe")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1.0), (2L, -1.0)); q.processAllAvailable()
      mem.addData((3L, 2.0)); q.processAllAvailable()
    } finally q.stop()
    spark.streams.removeListener(listener)

    var snap = listener.observedSnapshot
    val deadline = System.nanoTime() + 10e9.toLong
    while (snap.getOrElse("probe_gate.rows_seen", 0L) < 3L &&
        System.nanoTime() < deadline) {
      Thread.sleep(100); snap = listener.observedSnapshot
    }
    assert(snap.get("probe_gate.rows_seen").contains(3L), s"snapshot: $snap")
    assert(snap.get("probe_gate.rows_positive").contains(2L), s"snapshot: $snap")
  }

  test("fractional observe fields are gauges (latest wins), never summed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val listener = Metrics.attach(spark)
    val mem = MemoryStream[(Long, Double)]
    val observed = mem.toDF().toDF("id", "value")
      .observe("gauge_gate",
        count(lit(1)).as("rows_seen"),          // counter: sums
        avg($"value").as("mean_value"))          // gauge: latest wins
    val q = observed.writeStream.format("memory").queryName("gauge_probe")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (2L, 20.0)); q.processAllAvailable() // avg 15
      mem.addData((3L, 60.0)); q.processAllAvailable()             // avg 60
    } finally q.stop()
    spark.streams.removeListener(listener)

    var (snap, gauges) = (listener.observedSnapshot, listener.observedGaugeSnapshot)
    val deadline = System.nanoTime() + 10e9.toLong
    while (snap.getOrElse("gauge_gate.rows_seen", 0L) < 3L &&
        System.nanoTime() < deadline) {
      Thread.sleep(100)
      snap = listener.observedSnapshot
      gauges = listener.observedGaugeSnapshot
    }
    assert(snap.get("gauge_gate.rows_seen").contains(3L), s"snapshot: $snap")
    // The old behavior truncated and SUMMED batch averages (15 + 60 = 75);
    // the gauge map must instead hold the latest batch's value.
    assert(!snap.contains("gauge_gate.mean_value"),
      s"fractional field leaked into the counter map: $snap")
    assert(gauges.get("gauge_gate.mean_value").contains(60.0), s"gauges: $gauges")
  }
}
