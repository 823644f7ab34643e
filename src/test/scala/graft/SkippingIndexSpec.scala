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

  test("refresh indexes only new files and drops retired ones == rebuild") {
    val dir = tempDir("skipidx_inc")
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    events.filter(col("event_id") % 2 === 0)
      .coalesce(4).write.mode("overwrite").parquet(dir)
    val idx0 = SkippingIndex.build(spark, dir, "user_id")
      .collect().map(_.getString(0)).toSet

    // Append a wave of new files; refresh must index exactly those.
    events.filter(col("event_id") % 2 === 1)
      .coalesce(3).write.mode("append").parquet(dir)
    // A real deployment PERSISTS the index; mirror that so refresh reads
    // index rows, not a lazy plan over files that may since be gone.
    val idxDir = tempDir("skipidx_store")
    def persist(df: org.apache.spark.sql.DataFrame, v: String) = {
      df.write.mode("overwrite").parquet(s"$idxDir/$v")
      spark.read.parquet(s"$idxDir/$v")
    }
    val idx0df = persist(SkippingIndex.build(spark, dir, "user_id")
      .filter(col("file").isin(idx0.toSeq: _*)), "v0")
    val refreshed = persist(
      SkippingIndex.refresh(spark, dir, "user_id", idx0df), "v1")
    val rebuilt = SkippingIndex.build(spark, dir, "user_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getSeq[Int](1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(canon(refreshed) == canon(rebuilt))

    // Retire a file (the compaction/delete shape): refresh drops its row.
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    victim.delete()
    val after = SkippingIndex.refresh(spark, dir, "user_id", refreshed)
    assert(canon(after) == canon(SkippingIndex.build(spark, dir, "user_id")))
    assert(!after.collect().map(_.getString(0))
      .exists(_.endsWith(victim.getName)))
  }

  test("auto-prune: plain point-predicate scans consult the index in the planner") {
    import graft.plans.SkipPrunedFileIndex
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = tempDir("skipidx_auto")
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    events.repartitionByRange(16, col("user_id"))
      .write.mode("overwrite").parquet(dir)
    val nFiles = SkippingIndex.enableAutoPrune(spark, dir, "user_id")
    assert(nFiles >= 8)
    val key = events.select("user_id").orderBy(col("user_id").desc)
      .limit(1).collect()(0).getLong(0)
    try {
      // No manual lookup call — the optimizer rewrites the scan itself.
      val q = spark.read.parquet(dir).filter(col("user_id") === key)
      val prunedScans = q.queryExecution.optimizedPlan.collect {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.isInstanceOf[SkipPrunedFileIndex] =>
          r.location.inputFiles.length
      }
      assert(prunedScans.nonEmpty, "rule did not rewrite the scan")
      assert(prunedScans.head >= 1 && prunedScans.head <= 4,
        s"expected 1-4 candidate files, scanned ${prunedScans.head} of $nFiles")
      val got = q.select("event_id").collect().map(_.getLong(0)).sorted
      val full = spark.read.parquet(dir)
      SkippingIndex.disableAutoPrune(dir)
      val want = full.filter(col("user_id") === key)
        .select("event_id").collect().map(_.getLong(0)).sorted
      SkippingIndex.enableAutoPrune(spark, dir, "user_id")
      assert(got.sameElements(want) && got.nonEmpty)

      // Absent key: the intersection is empty — zero files planned, empty
      // result, schema intact.
      val none = spark.read.parquet(dir).filter(col("user_id") === 1000000000L)
      val zeroScan = none.queryExecution.optimizedPlan.collect {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.isInstanceOf[SkipPrunedFileIndex] =>
          r.location.inputFiles.length
      }
      assert(zeroScan.headOption.contains(0))
      assert(none.isEmpty && none.columns.length === 4)

      // Non-key predicates and other tables stay untouched.
      val other = spark.read.parquet(dir).filter(col("event_id") === 7L)
      assert(other.queryExecution.optimizedPlan.collect {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _)
            if r.location.isInstanceOf[SkipPrunedFileIndex] => 1
      }.isEmpty)
    } finally SkippingIndex.disableAutoPrune(dir)
  }
}
