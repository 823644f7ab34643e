package graft

import graft.sources.Tables
import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.{Event, Flagged}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live anomaly detector must agree with the oracle-checked batch
  * operator `ts_anomaly` — same flagged events, same z-scores — when fed
  * the same events in event-time order across several micro-batches. */
class AnomalyStreamSpec extends SparkSpec {

  test("streaming anomaly flags == batch ts_anomaly on the same events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // Batch truth from the differential-checked query (z rounded to 4).
    val batch = SparkEntry.queries("ts_anomaly")(spark, sfDir)
      .select($"event_id", round($"z", 4).as("z")).as[(Long, Double)]
      .collect().toMap
    assert(batch.nonEmpty, "fixture produced no anomalies — parity test is vacuous")

    // Same rows, event-time order, split into 4 micro-batches.
    val events = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"event_type", $"value")
      .orderBy($"ts", $"event_id").as[Event].collect()

    val mem = MemoryStream[Event]
    val q = AnomalyStream.detect(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    try {
      events.grouped(math.max(events.length / 4, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val live = spark.table("anomaly_out").as[Flagged].collect()
        .map(f => f.event_id -> BigDecimal(f.z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .toMap
      assert(live.keySet == batch.keySet,
        s"flag sets differ: only-live=${live.keySet -- batch.keySet} " +
          s"only-batch=${batch.keySet -- live.keySet}")
      val maxDrift = live.map { case (id, z) => math.abs(z - batch(id)) }.max
      assert(maxDrift == 0.0, s"z-scores drifted, max |Δ| = $maxDrift")
    } finally q.stop()
  }

  test("a cross-batch out-of-order arrival fails loudly, not silently") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(id: Long, min: Int): Event =
      Event(id, java.sql.Timestamp.valueOf(f"2024-03-01 10:$min%02d:00"), "click", id.toDouble)

    val mem = MemoryStream[Event]
    val q = AnomalyStream.detect(mem.toDS())
      .writeStream.format("memory").queryName("anomaly_ooo")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 10), ev(2, 20))
      q.processAllAvailable()
      // A later batch delivering an event BEFORE the key's consumed
      // high-water mark violates the ordering contract the trailing-window
      // semantics depend on — the stream must fail with a clear message.
      mem.addData(ev(3, 15))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(60000)
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("out-of-order arrival")),
        s"expected the ordering-contract failure, got: ${msgs(ex).mkString(" | ")}")
    } finally q.stop()
  }
}
