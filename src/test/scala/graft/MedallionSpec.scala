package graft

import graft.pipeline.ActivityPipeline
import graft.streaming.{ActivityGenerator, Medallion}
import org.apache.spark.sql.functions._

/** End-to-end streaming pipeline test (SURVEY §5 item 2): seeded generator →
  * bronze/silver/gold with Trigger.AvailableNow → invariants:
  *   - gate totality: valid + quarantine = input;
  *   - quarantine = exactly the injected invalid rows;
  *   - silver log_ids unique and complete (single micro-batch);
  *   - gold matches the declared-semantics batch recompute;
  *   - second run is exactly-once: only new files are processed.
  */
class MedallionSpec extends SparkSpec {

  test("medallion pipeline end-to-end with AvailableNow") {
    val dirs = Medallion.Dirs(tempDir("medallion"))
    val gen = ActivityGenerator.generate(dirs.raw, numFiles = 4, rowsPerFile = 1500)

    Medallion.runAvailableNow(spark, dirs)

    val bronze = spark.read.parquet(dirs.bronze)
    val quarantine = spark.read.parquet(dirs.quarantine)
    val silver = spark.read.parquet(dirs.silver)
    val gold = spark.read.parquet(dirs.gold)

    // Gate totality + quarantine exactness.
    assert(bronze.count() + quarantine.count() === gen.totalRows.toLong)
    assert(quarantine.count() === gen.invalidRows.toLong)
    // Quarantine carries the audit columns (P7).
    assert(quarantine.columns.contains("dq_reason"))
    assert(quarantine.columns.contains("processing_time"))

    // Silver: globally unique log_ids, one per distinct valid log_id
    // (everything fits one micro-batch, so nothing is late).
    val silverCount = silver.count()
    assert(silver.select("log_id").distinct().count() === silverCount)
    assert(silverCount === gen.distinctValidLogIds.toLong)
    // Enrichment totality: every row has a region.
    assert(silver.filter(col("geo_region").isNull).count() === 0L)

    // Gold == declared-semantics batch recompute over the same silver rows.
    val recomputed = ActivityPipeline.gold(silver)
    assert(gold.except(recomputed).count() === 0L)
    assert(recomputed.except(gold).count() === 0L)
    assert(gold.count() === silver.select("user_id").distinct().count())

    // Exactly-once across restarts: drop one NEW file in, re-run, and the
    // totals grow by exactly that file's rows — checkpoints skip all
    // already-committed input, the new file is ingested exactly once.
    val side = tempDir("raw2")
    val gen2 = ActivityGenerator.generate(side, numFiles = 1, rowsPerFile = 500, seed = 43L)
    assert(new java.io.File(side, "user_activity_001.csv")
      .renameTo(new java.io.File(dirs.raw, "user_activity_101.csv")))

    Medallion.runAvailableNow(spark, dirs)
    val bronzeAfter = spark.read.parquet(dirs.bronze)
    val quarantineAfter = spark.read.parquet(dirs.quarantine)
    assert(bronzeAfter.count() + quarantineAfter.count() ===
      (gen.totalRows + gen2.totalRows).toLong)
  }
}
