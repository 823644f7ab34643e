package graft

import graft.streaming.Medallion
import org.apache.spark.sql.streaming.Trigger

/** The silver dedup state must survive a full stop/restart cycle: a log_id
  * first seen in run 1 and re-sent (within the watermark) in run 2 — a
  * separate streaming query recovered from the checkpoint — must stay
  * suppressed. This is the RocksDB-state + checkpoint recovery contract the
  * exactly-once claim rests on. */
class StateRecoverySpec extends SparkSpec {

  private def writeRaw(dir: String, name: String, rows: Seq[String]): Unit = {
    new java.io.File(dir).mkdirs()
    val out = new java.io.PrintWriter(new java.io.File(dir, name))
    out.println("log_id,user_id,timestamp,ip_address,watch_time(min)")
    rows.foreach(out.println)
    out.close()
  }

  private def drainToSilver(dirs: Medallion.Dirs): Unit = {
    val t = Trigger.AvailableNow()
    val (bv, bq) = Medallion.startBronze(spark, dirs, t)
    assert(bv.awaitTermination(120000) && bq.awaitTermination(120000))
    assert(Medallion.startSilver(spark, dirs, t).awaitTermination(120000))
  }

  test("dedup state suppresses a replayed key across restarts") {
    val dirs = Medallion.Dirs(tempDir("state_recovery"))

    writeRaw(dirs.raw, "batch1.csv", Seq(
      "log_A,user_1,2024-03-01 10:00:00,192.168.1.5,10",
      "log_B,user_2,2024-03-01 10:01:00,10.0.0.9,20"))
    drainToSilver(dirs)

    // Run 2: a brand-new streaming query instance recovers from the
    // checkpoint; log_A re-arrives 1 minute later (well inside the 2h
    // watermark) plus one genuinely new key.
    writeRaw(dirs.raw, "batch2.csv", Seq(
      "log_A,user_1,2024-03-01 10:01:00,192.168.1.5,99",
      "log_C,user_3,2024-03-01 10:02:00,172.16.0.3,30"))
    drainToSilver(dirs)

    val silver = spark.read.parquet(dirs.silver)
    val byId = silver.groupBy("log_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byId === Map("log_A" -> 1L, "log_B" -> 1L, "log_C" -> 1L),
      s"replayed key not suppressed across restart: $byId")
    // And the surviving log_A is the FIRST occurrence (watch_time 10).
    val wt = silver.filter(org.apache.spark.sql.functions.col("log_id") === "log_A")
      .select("watch_time").head.getDouble(0)
    assert(wt === 10.0, s"restart kept the wrong occurrence: $wt")
  }
}
