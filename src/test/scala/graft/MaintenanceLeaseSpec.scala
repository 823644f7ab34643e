package graft

import graft.llm.MmFeatures
import graft.sources.{MaintenanceLease, SortedRunIndex}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Concurrent-maintainer arbitration on the log-less table protocols:
  * when two compactions race, exactly one proceeds and the other refuses
  * LOUDLY — and no interleaving order loses data. The crash-window
  * recovery of a single maintainer is covered by MaintenanceSpec /
  * SortedRunIndexSpec; this pins the live-concurrency guard those specs
  * assumed away.
  */
class MaintenanceLeaseSpec extends SparkSpec {

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rows(root: String): Set[Long] =
    SortedRunIndex.readAll(spark, root,
      spark.range(0).select(col("id").as("k"), col("id").as("v")))
      .select("k").collect().map(_.getLong(0)).toSet

  test("sorted-run compaction: second live maintainer refuses loudly, no data loss") {
    val root = tempDir("lease_sri")
    val s0 = spark
    import s0.implicits._
    (0L to 3L).foreach { b =>
      SortedRunIndex.append(
        Seq.tabulate(50)(i => (b * 100L + i, i.toLong)).toDF("k", "v"),
        root, b)
    }
    val before = rows(root)
    val fs = fsOf(new Path(root))
    // Maintainer A is mid-compaction (holds the lease)…
    val a = MaintenanceLease.acquire(fs, new Path(root), "maintainer-A")
    // …so maintainer B must refuse loudly, not interleave.
    val e = intercept[MaintenanceLease.ConcurrentMaintenanceException](
      SortedRunIndex.compact(spark, root, "k", rowsPerFile = 64))
    assert(e.getMessage.contains("maintainer-A"))
    assert(e.getMessage.contains("refused"))
    assert(rows(root) === before, "refused compaction must not touch data")
    // A finishes and releases; B's retry wins and folds the deltas.
    MaintenanceLease.release(fs, a)
    val (folded, files) = SortedRunIndex.compact(spark, root, "k", rowsPerFile = 64)
    assert(folded === 3 && files > 0)
    assert(rows(root) === before, "compaction must preserve every row")
    // Reverse order: B now "holds" (is mid-compaction); A refuses.
    val b = MaintenanceLease.acquire(fs, new Path(root), "maintainer-B")
    intercept[MaintenanceLease.ConcurrentMaintenanceException](
      SortedRunIndex.compact(spark, root, "k", rowsPerFile = 64))
    MaintenanceLease.release(fs, b)
    assert(rows(root) === before)
  }

  test("batch-dir compaction: lease arbitration + operator break path") {
    val root = tempDir("lease_mmf")
    val s0 = spark
    import s0.implicits._
    (0L to 3L).foreach { b =>
      Seq.tabulate(20)(i => (b * 100L + i, i)).toDF("asset_id", "x")
        .write.mode("overwrite").parquet(s"$root/batch=$b")
    }
    def all(): Set[Long] = spark.read.parquet(root)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    val before = all()
    val fs = fsOf(new Path(root))
    val a = MaintenanceLease.acquire(fs, new Path(root), "maintainer-A")
    val e = intercept[MaintenanceLease.ConcurrentMaintenanceException](
      MmFeatures.compactBatches(spark, root))
    assert(e.getMessage.contains("maintainer-A"))
    assert(all() === before)
    // A crashed: the refusal message's documented remedy — verify dead,
    // break the lease — unblocks the next maintainer.
    assert(MaintenanceLease.break(fs, new Path(root)))
    val (nb, na) = MmFeatures.compactBatches(spark, root)
    assert(nb === 4 && na === 2) // 3 merged into one + keepLast
    assert(all() === before, "compaction must preserve every row")
    // The lease is released after a successful run: the next one proceeds.
    val (nb2, na2) = MmFeatures.compactBatches(spark, root)
    assert(nb2 === na2, "second run is a no-op but must not be blocked")
  }
}
