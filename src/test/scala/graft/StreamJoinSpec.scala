package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join semantics: in-window pairs match, out-of-
  * window pairs don't, and LEFT OUTER null-extends an unmatched activity
  * row only after the watermark proves no match can still arrive. */
class StreamJoinSpec extends SparkSpec {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("interval inner join pairs rows within tolerance, not outside it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val act = MemoryStream[(String, java.sql.Timestamp, Double)]
    val look = MemoryStream[(String, java.sql.Timestamp, String)]
    val joined = StreamJoin.intervalJoin(
      act.toDF().toDF("key", "ts", "value"),
      look.toDF().toDF("key", "ts", "tag"))
    val q = joined.writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      // u1's lookup is 3 min before the activity (in tolerance); u2's is
      // 7 min before (outside); u3 matches on time but not key.
      act.addData(
        ("u1", t("2024-01-01 00:10:00"), 1.0),
        ("u2", t("2024-01-01 00:10:00"), 2.0))
      look.addData(
        ("u1", t("2024-01-01 00:07:00"), "ok"),
        ("u2", t("2024-01-01 00:03:00"), "stale"),
        ("u3", t("2024-01-01 00:09:00"), "wrong-key"))
      q.processAllAvailable()
      val rows = spark.table("ssj_inner")
        .select($"key", $"l_tag").as[(String, String)].collect().toSet
      assert(rows === Set(("u1", "ok")),
        s"interval join matched the wrong pairs: $rows")
    } finally q.stop()
  }

  test("left outer emits the unmatched side only after the watermark closes it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val act = MemoryStream[(String, java.sql.Timestamp, Double)]
    val look = MemoryStream[(String, java.sql.Timestamp, String)]
    val joined = StreamJoin.intervalJoin(
      act.toDF().toDF("key", "ts", "value"),
      look.toDF().toDF("key", "ts", "tag"), joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      act.addData(
        ("u1", t("2024-01-01 00:10:00"), 1.0),
        ("u2", t("2024-01-01 00:10:00"), 2.0))
      look.addData(("u1", t("2024-01-01 00:08:00"), "ok"))
      q.processAllAvailable()
      val early = spark.table("ssj_outer")
        .select($"key", $"l_tag").as[(String, Option[String])].collect().toMap
      assert(early.get("u1").flatten.contains("ok"))
      assert(!early.contains("u2"),
        "unmatched row emitted before the watermark proved no match can come")

      // Advance both watermarks far past u2's join window → the outer row
      // must now appear with a null lookup side.
      act.addData(("wm", t("2024-01-01 02:00:00"), 0.0))
      look.addData(("wm2", t("2024-01-01 02:00:00"), "x"))
      q.processAllAvailable()
      val late = spark.table("ssj_outer")
        .select($"key", $"l_tag").as[(String, Option[String])].collect().toMap
      assert(late.contains("u2"), "outer row never emitted")
      assert(late("u2").isEmpty, "outer row must null-extend the lookup side")
    } finally q.stop()
  }
}
