package graft

import graft.streaming.UserTotals
import graft.streaming.UserTotals.{Activity, Total}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState user totals: the running per-user aggregate must
  * equal a batch recompute over everything fed so far, state must carry
  * across micro-batches, and only touched keys may emit per batch. */
class UserTotalsSpec extends SparkSpec {

  test("running totals across micro-batches == batch recompute; only touched keys emit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val waves: Seq[Seq[Activity]] = Seq(
      Seq(Activity("u1", 10), Activity("u2", 5), Activity("u1", 7)),
      Seq(Activity("u2", 3), Activity("u3", 20)),
      Seq(Activity("u1", 1)))

    val mem = MemoryStream[Activity]
    val q = UserTotals.totals(mem.toDS())
      .writeStream.format("memory").queryName("user_totals_out")
      .option("checkpointLocation", tempDir("user_totals_cp"))
      .outputMode("update").start()
    try {
      var batchEnd = 0L
      waves.zipWithIndex.foreach { case (wave, i) =>
        mem.addData(wave: _*)
        q.processAllAvailable()
        val all = spark.table("user_totals_out").as[Total].collect()
        val emitted = all.drop(batchEnd.toInt)
        batchEnd = all.length.toLong
        // Only the keys this wave touched emit an update.
        assert(emitted.map(_.user_id).toSet === wave.map(_.user_id).toSet,
          s"wave $i emitted for untouched keys")
        // The latest emission per key equals a from-scratch recompute of
        // everything fed so far — state carried exactly.
        val fedSoFar = waves.take(i + 1).flatten
        val expect = fedSoFar.groupBy(_.user_id).map { case (u, as) =>
          u -> ((as.map(_.watch_time).sum, as.length.toLong))
        }
        val latest = all.groupBy(_.user_id).map { case (u, ts) => u -> ts.last }
        latest.foreach { case (u, t) =>
          assert((t.total_watch_time, t.n_events) === expect(u),
            s"wave $i: $u diverged from batch recompute")
        }
      }
    } finally q.stop()

    // Restart from the same checkpoint (foreachBatch sink — the memory
    // sink refuses recovery): state survives the query, a new wave keeps
    // accumulating on top of it.
    val mem2 = MemoryStream[Activity]
    val cp = tempDir("user_totals_restart_cp")
    val buf = scala.collection.mutable.ArrayBuffer[Total]()
    def startFb() = UserTotals.totals(mem2.toDS())
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Total], _: Long) =>
        buf.synchronized { buf ++= df.collect() }
        ()
      }
      .option("checkpointLocation", cp)
      .outputMode("update").start()

    val qa = startFb()
    try {
      mem2.addData(Activity("u9", 20))
      qa.processAllAvailable()
    } finally qa.stop()
    val qb = startFb()
    try {
      mem2.addData(Activity("u9", 2))
      qb.processAllAvailable()
      val t = buf.synchronized(buf.filter(_.user_id == "u9").last)
      assert((t.total_watch_time, t.n_events) === ((22.0, 2L)),
        "state did not survive a checkpointed restart")
    } finally qb.stop()
  }
}
