package graft

import graft.streaming.Maintenance
import org.apache.spark.sql.functions._

/** Compaction: fewer files, identical data, commit log retired. */
class MaintenanceSpec extends SparkSpec {

  test("compaction preserves data and reduces file counts") {
    val s = spark
    import s.implicits._
    val dir = tempDir("compact")
    // A deliberately fragmented partitioned table (20 files per partition).
    (1 to 2000).map(i => (i.toLong, s"v$i", s"2024-03-0${i % 2 + 1}"))
      .toDF("id", "v", "event_date")
      .repartition(20)
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect()

    // A (fake) sink commit log that compaction must retire — while present,
    // metadata-aware readers would resolve the table through it.
    val meta = new java.io.File(s"$dir/_spark_metadata")
    meta.mkdirs()

    val results = Maintenance.compactTable(spark, dir, targetFileMB = 128)
    assert(results.size === 2)
    results.foreach { case (part, nBefore, nAfter) =>
      assert(nAfter < nBefore, s"$part: $nBefore -> $nAfter files")
      assert(nAfter === 1) // tiny data → single target file
    }
    assert(!meta.exists(), "sink commit log must be retired")

    val after = spark.read.parquet(dir).orderBy("id").collect()
    assert(after === before, "compaction changed table contents")
  }
}
