package graft

import graft.sources.Tables
import graft.streaming.DriftStream
import graft.streaming.DriftStream.{DriftRow, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The live drift monitor must agree with the oracle-checked batch
  * operator `ts_cusum` — same hourly counts, bit-identical CUSUM values,
  * same drift flags — for every COMPLETED hour, when fed the same events
  * in event-time order across several micro-batches and the reference
  * means profiled by the batch path. */
class DriftStreamSpec extends SparkSpec {

  test("streaming drift rows == batch ts_cusum on completed hours") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // Batch truth (bucket string, count, cusum, flag) keyed per type+hour.
    val batch = SparkEntry.queries("ts_cusum")(spark, sfDir)
      .select($"event_type", $"bucket", $"c", $"cusum", $"drift")
      .as[(String, String, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(batch.nonEmpty)

    // The frozen reference profile — same spelling the batch query uses.
    val refMeans = Tables.load(spark, sfDir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("b"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy($"event_type")
      .agg((sum($"c".cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double") / count(lit(1))).as("m"))
      .as[(String, Double)].collect().toMap

    val events = Tables.load(spark, sfDir, "events")
      .select($"event_id", $"ts", $"event_type")
      .orderBy($"ts", $"event_id").as[Event].collect()

    val mem = MemoryStream[Event]
    val q = DriftStream.detect(mem.toDS(), refMeans)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      events.grouped(math.max(events.length / 5, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      // The session clock is UTC (GraftSession); hour arithmetic in
      // DriftStream is epoch-based, so format in UTC to compare.
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      val live = spark.table("drift_out").as[DriftRow].collect()
        .map(r => (r.event_type, fmt.format(r.bucket)) -> (r.c, r.cusum, r.drift))
        .toMap

      // The stream emits every hour except each type's final (still-open)
      // one; everything emitted must match the batch rows bit-for-bit.
      assert(live.nonEmpty)
      live.foreach { case (k, (c, cusum, drift)) =>
        val b = batch.getOrElse(k, fail(s"stream emitted unknown bucket $k"))
        assert(b._1 === c, s"$k count")
        assert(b._2 === cusum, s"$k cusum (batch ${b._2} vs live $cusum)")
        assert(b._3 === drift, s"$k drift flag")
      }
      val missing = batch.keySet -- live.keySet
      // Only the open tail hour per type may be missing.
      val tailHours = batch.keySet.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
      assert(missing.subsetOf(tailHours),
        s"stream failed to emit completed hours: ${missing -- tailHours}")
    } finally q.stop()
  }

  test("a cross-batch out-of-order arrival fails loudly, not silently") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    def ev(id: Long, min: Int): Event =
      Event(id, java.sql.Timestamp.valueOf(f"2024-03-01 10:$min%02d:00"), "click")

    val mem = MemoryStream[Event]
    val q = DriftStream.detect(mem.toDS(), Map("click" -> 1.0))
      .writeStream.format("memory").queryName("drift_ooo")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 10), ev(2, 20))
      q.processAllAvailable()
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
