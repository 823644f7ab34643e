package graft

import graft.llm.WebCuration
import graft.streaming.BoilerplateStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for incremental boilerplate detection: after draining
  * the corpus in waves (restart per wave), the emitted ban list equals
  * the batch [[WebCuration.bannedLines]] definition, each line exactly
  * once, with sub-threshold lines never emitted. */
class BoilerplateStreamSpec extends SparkSpec {

  test("streamed ban list equals the batch definition; exactly-once emission") {
    val landing = tempDir("boiler-landing")
    val out = tempDir("boiler-out")
    val cp = tempDir("boiler-cp")
    val lined = WebCuration.linedDocs(spark, sfDir)
      .select("doc_id", "aug").cache()

    // Three waves split by id mod 3: the planted footers accumulate
    // ACROSS waves, so the threshold crossing happens mid-stream and the
    // state genuinely carries counts over batch and restart boundaries.
    (0 to 2).foreach { wave =>
      lined.filter(pmod(col("doc_id"), lit(3)) === wave)
        .write.mode("append").parquet(landing)
      // Fresh query per wave resuming from the same checkpoint = restart.
      BoilerplateStream.runAvailableNow(spark, landing, out, cp,
        minDocs = 3, maxFilesPerTrigger = 2)
    }

    val streamed = BoilerplateStream.bannedSet(spark, out).cache()
    // Exactly-once: no line appears twice in the sink.
    assert(streamed.count() === streamed.select("line").distinct().count())
    // Stream == batch ban list.
    val batch = WebCuration.bannedLines(
      WebCuration.explodedLines(lined), minDocs = 3).cache()
    assert(streamed.select("line").except(batch).count() === 0,
      "stream banned lines the batch definition does not")
    assert(batch.except(streamed.select("line")).count() === 0,
      "stream missed lines the batch definition bans")
    // The planted 2-doc rare footer stays below the threshold.
    assert(streamed.filter(col("line")
      .contains("rare footer only two documents share this")).count() === 0)
    // Emission carries the crossing count: >= threshold, and for the
    // planted footers the crossing happened before the corpus total.
    assert(streamed.filter(col("n_docs") < 3).count() === 0)
    val footerRow = streamed
      .filter(col("line") === "copyright footer terms apply all rights reserved")
      .collect()
    assert(footerRow.length === 1)
    val corpusTotal = lined
      .filter(col("aug").contains("copyright footer terms apply all rights reserved"))
      .count()
    assert(footerRow(0).getLong(1) <= corpusTotal)

    // Replay of an already-drained landing dir emits nothing new.
    val before = streamed.count()
    BoilerplateStream.runAvailableNow(spark, landing, out, cp, minDocs = 3)
    assert(BoilerplateStream.bannedSet(spark, out).count() === before)
    streamed.unpersist(); batch.unpersist(); lined.unpersist()
  }

  test("bannedSet on a sink with no committed data is an empty ban list, not a crash") {
    // A consumer polling before the stream's first emission sees a dir
    // holding only _spark_metadata (or nothing at all) — the explicit
    // sink schema makes that the empty DataFrame instead of an
    // unable-to-infer-schema failure.
    val empty = tempDir("boiler-empty")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(empty, "_spark_metadata"))
    val df = BoilerplateStream.bannedSet(spark, empty)
    assert(df.count() === 0)
    assert(df.columns.toSeq === Seq("line", "n_docs"))
  }
}
