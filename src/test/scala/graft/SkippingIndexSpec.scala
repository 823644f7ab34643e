package graft

import graft.sources.{SkippingIndex, Tables}
import org.apache.spark.sql.functions._

/** File-level membership index: the pruning is real (few candidate files
  * under a range layout), results are exact for present AND absent keys,
  * and no false negative exists for any sampled key. */
class SkippingIndexSpec extends SparkSpec {

  test("range-layout point lookups prune to few files, results exact") {
    val dir = tempDir("skipidx")
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    events.repartitionByRange(16, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val idx = SkippingIndex.build(spark, dir, "user_id").cache()
    // Range sampling at this tiny fixture can leave a couple of empty
    // partitions; what matters is one index row per actual data file.
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(idx.count() === nFiles.toLong && nFiles >= 8)

    // Exactness + no false negatives across sampled keys.
    val keys = events.select("user_id").distinct()
      .orderBy(col("user_id")).limit(50)
      .collect().map(_.getLong(0))

    // Pruning: under a range layout a point key lives in ~1 file; the
    // 16-bit fingerprints may admit a few false-positive files, never
    // most of the table.
    val cand = SkippingIndex.candidateFiles(idx, lit(keys.head)).count()
    assert(cand >= 1 && cand <= 4, s"expected 1-4 candidate files, got $cand")
    keys.foreach { k =>
      val got = SkippingIndex.lookup(spark, dir, idx, "user_id", lit(k))
        .select("event_id").collect().map(_.getLong(0)).sorted
      val want = spark.read.parquet(dir).filter(col("user_id") === k)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want), s"lookup($k) diverged from full scan")
      assert(got.nonEmpty)
    }

    // A provably-absent key: zero candidates, empty result, right schema.
    val absent = SkippingIndex.lookup(spark, dir, idx, "user_id",
      lit(1000000000L))
    assert(SkippingIndex.candidateFiles(idx, lit(1000000000L)).isEmpty)
    assert(absent.isEmpty)
    assert(absent.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
    idx.unpersist()
  }
}
