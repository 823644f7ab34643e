package graft

import java.nio.file.{Files, Paths}

import graft.sources.ByteCappedFileSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The byte-capped DSv2 streaming source (maxBytesPerTrigger analog):
  * batches admit files greedily under the byte budget, rows parse with the
  * declared schema, and a restart resumes exactly-once from the checkpoint. */
class ByteCappedSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("log_id", StringType),
    StructField("user_id", StringType),
    StructField("watch_time", LongType)))

  private def writeFile(dir: String, name: String, rows: Int): Long = {
    val sb = new StringBuilder("log_id,user_id,watch_time\n")
    for (i <- 1 to rows) sb.append(s"$name-$i,u$i,${i * 10}\n")
    val p = Paths.get(dir, name)
    Files.writeString(p, sb.toString)
    Files.size(p)
  }

  test("admits files per trigger under the byte cap; restart is exactly-once") {
    val in = tempDir("bcap_in")
    val cp = tempDir("bcap_cp")
    val outDir = tempDir("bcap_out")
    val sizes = (1 to 4).map(i => writeFile(in, f"f$i%02d.csv", rows = 50))
    // Cap ≈ 1.5 files → every batch admits exactly one file (greedy, ≥1).
    val cap = (sizes.max * 3) / 2

    def start() = spark.readStream
      .format(classOf[ByteCappedFileSource].getName)
      .schema(schema)
      .option("maxBytesPerTrigger", cap.toString)
      .option("header", "true")
      .option("path", in)
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cp)
      .outputMode("append").start()

    val q = start()
    try {
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      assert(out.count() === 200L, "all rows from all files ingested")
      // Row fidelity: typed long column and null-free parse.
      assert(out.agg(sum("watch_time")).head.getLong(0) === 4L * (1 to 50).map(_ * 10L).sum)
      // Byte cap respected: 4 files at cap≈1.5 files → 4 separate batches
      // (each progress report admits ≤ cap bytes ⇒ ≤ 1 file here).
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 4,
        s"expected 4 capped batches, saw ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows === 50))
    } finally q.stop()

    // New file + restart from the same checkpoint → ONLY the new file reads.
    writeFile(in, "f05.csv", rows = 30)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 230L,
        "restart must resume from the checkpoint, not re-ingest")
      val b2 = q2.recentProgress.filter(_.numInputRows > 0)
      assert(b2.map(_.numInputRows.toInt).sum === 30)
    } finally q2.stop()
  }

  test("dual caps on one stream: the files cap binds when the byte budget is loose") {
    val in = tempDir("bcap_dual_in")
    val cp = tempDir("bcap_dual_cp")
    val outDir = tempDir("bcap_dual_out")
    (1 to 6).foreach(i => writeFile(in, f"d$i%02d.csv", rows = 20))
    // Byte budget fits all six files; maxFilesPerTrigger=2 must still close
    // each batch at two files (the reference sets BOTH caps on one stream).
    val q = spark.readStream
      .format(classOf[ByteCappedFileSource].getName)
      .schema(schema)
      .option("maxBytesPerTrigger", (100L * 1024 * 1024).toString)
      .option("maxFilesPerTrigger", "2")
      .option("header", "true")
      .option("path", in)
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cp)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 120L)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 3,
        s"expected 3 two-file batches, saw ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows === 40))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains everything in capped batches, then stops") {
    val in = tempDir("bcap_an_in")
    val cp = tempDir("bcap_an_cp")
    val outDir = tempDir("bcap_an_out")
    val sizes = (1 to 3).map(i => writeFile(in, f"g$i%02d.csv", rows = 40))
    val q = spark.readStream
      .format(classOf[ByteCappedFileSource].getName)
      .schema(schema)
      .option("maxBytesPerTrigger", ((sizes.max * 3) / 2).toString)
      .option("header", "true")
      .option("path", in)
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    // The query must terminate on its own once the frozen listing drains.
    assert(q.awaitTermination(120000), "AvailableNow query did not terminate")
    assert(spark.read.parquet(outDir).count() === 120L)
  }

  test("a mutated consumed prefix fails the batch loudly, not silently") {
    val in = tempDir("bcap_tamper_in")
    val cp = tempDir("bcap_tamper_cp")
    val outDir = tempDir("bcap_tamper_out")
    (1 to 3).foreach(i => writeFile(in, f"h$i%02d.csv", rows = 10))

    def start() = spark.readStream
      .format(classOf[ByteCappedFileSource].getName)
      .schema(schema)
      .option("header", "true")
      .option("path", in)
      .load()
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", cp)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()

    assert(start().awaitTermination(120000))
    assert(spark.read.parquet(outDir).count() === 30L)

    // Delete a CONSUMED file and land a new one: the positional offset now
    // points past a different boundary file. The checkpointed offset carries
    // the boundary NAME, so the restarted stream must fail with a clear
    // message instead of remapping indices and reading the wrong files.
    Files.delete(Paths.get(in, "h02.csv"))
    writeFile(in, "h04.csv", rows = 10)
    val q = start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(120000)
    }
    assert(ex.getMessage.contains("deleted, renamed") ||
      Option(ex.getCause).exists(_.getMessage.contains("deleted, renamed")),
      s"expected a boundary-mismatch failure, got: ${ex.getMessage}")
  }
}
