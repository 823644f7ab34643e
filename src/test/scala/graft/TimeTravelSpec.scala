package graft

import graft.streaming.TimeTravel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Snapshot reads over the streaming sink's commit log: AS OF batch N sees
  * exactly the rows batches 0..N committed, and uncommitted orphan files
  * remain invisible at every version. */
class TimeTravelSpec extends SparkSpec {

  test("as-of reads reconstruct each committed version exactly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = tempDir("tt_table")
    val cp = tempDir("tt_cp")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", dir).option("checkpointLocation", cp)
      .outputMode("append").start()
    try {
      mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      mem.addData((3L, "c")); q.processAllAvailable()
      mem.addData((4L, "d"), (5L, "e")); q.processAllAvailable()
    } finally q.stop()

    val batches = TimeTravel.batches(spark, dir)
    assert(batches === Seq(0L, 1L, 2L), s"unexpected batch ids: $batches")

    def ids(batchId: Long): Seq[Long] =
      TimeTravel.asOf(spark, dir, batchId).select("id").as[Long].collect().toSeq.sorted
    assert(ids(0L) === Seq(1L, 2L))
    assert(ids(1L) === Seq(1L, 2L, 3L))
    assert(ids(2L) === Seq(1L, 2L, 3L, 4L, 5L))

    // An orphan data file (aborted-task leftover the log never admitted)
    // must stay invisible at EVERY version — snapshots trust the log, not
    // the listing.
    (9000L to 9001L).map((_, "orphan")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.orphan_stage")
    val orphan = new java.io.File(s"$dir/.orphan_stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(orphan.toPath,
      new java.io.File(dir, "part-99999-orphan.parquet").toPath)
    assert(ids(2L) === Seq(1L, 2L, 3L, 4L, 5L),
      "orphan file leaked into a snapshot read")

    // Nonexistent table dir → no batches, not an exception.
    assert(TimeTravel.batches(spark, tempDir("tt_empty")).isEmpty)
  }
}
