package graft

import graft.llm.{MmFeatures, Multimodal}
import graft.streaming.FeatureStream
import org.apache.spark.sql.functions._

/** The streamed feature table must be indistinguishable from a batch
  * decode of everything ingested — across waves, restarts, and replays —
  * and each trigger's decode work must be proportional to its increment. */
class FeatureStreamSpec extends SparkSpec {

  private def imageIds = spark.read.parquet(s"$sfDir/documents.parquet")
    .filter(col("doc_id") % 3 === 0).select(col("doc_id"))

  test("waves + restart: accumulated features equal a fresh batch decode") {
    val landing = tempDir("fs_landing")
    val fdir = tempDir("fs_state")
    val cp = tempDir("fs_cp")
    val before = MmFeatures.decodeCount.get()
    (0 to 2).foreach { wave =>
      imageIds.filter(expr("(doc_id DIV 3) % 3") === wave)
        .coalesce(1).write.mode("append").parquet(landing)
      FeatureStream.runAvailableNow(spark, landing, fdir, cp)
    }
    val nImages = imageIds.count()
    // Decode work across all waves = one pass over the corpus, no wave
    // ever re-decoding earlier arrivals.
    assert(MmFeatures.decodeCount.get() - before === nImages)

    val streamed = MmFeatures.read(spark, fdir).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))).toMap
    val batch = {
      import org.apache.spark.sql.SparkSession
      val s: SparkSession = spark
      import s.implicits._
      MmFeatures.decodeFeatures(
        Multimodal.assetsFromIds(imageIds.as[Long])).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4)))).toMap
    }
    assert(streamed === batch)

    // Re-draining with nothing new landed is a no-op (checkpoint resumes
    // past all committed batches).
    val c0 = MmFeatures.decodeCount.get()
    FeatureStream.runAvailableNow(spark, landing, fdir, cp)
    assert(MmFeatures.decodeCount.get() === c0, "empty drain re-decoded")
    assert(MmFeatures.read(spark, fdir).count() === nImages)
  }

  test("compaction maintains the feature table without changing a row") {
    // Micro-batched appends accrete one-or-more small files per batch= dir;
    // at decode-fleet scale that's thousands of files/day. The layer
    // Maintenance compactor applies unchanged — features are just another
    // maintained table — and the read-back is row-identical after it.
    val landing = tempDir("fsc_landing")
    val fdir = tempDir("fsc_state")
    val cp = tempDir("fsc_cp")
    (0 to 2).foreach { wave =>
      imageIds.filter(expr("(doc_id DIV 3) % 3") === wave)
        .repartition(4).write.mode("append").parquet(landing)
      FeatureStream.runAvailableNow(spark, landing, fdir, cp)
    }
    val before = MmFeatures.read(spark, fdir).collect().map(_.toString).sorted
    def nDirs = java.nio.file.Files.list(java.nio.file.Paths.get(fdir))
      .toArray.map(_.toString).count(_.contains("batch="))
    val dirsBefore = nDirs
    val (b0, a0) = MmFeatures.compactBatches(spark, fdir, keepLast = 1)
    info(s"compact: $b0 -> $a0 batch dirs")
    assert(b0 === dirsBefore && a0 === 2,
      s"expected consolidation to (merged + newest) dirs, got $b0 -> $a0")
    assert(nDirs === 2)
    val after = MmFeatures.read(spark, fdir).collect().map(_.toString).sorted
    assert(after.toSeq === before.toSeq, "compaction changed the table")
    // Idempotent: a second run has at most one mergeable dir and no-ops.
    val (b1, a1) = MmFeatures.compactBatches(spark, fdir, keepLast = 1)
    assert(b1 === 2 && a1 === 2)

    // Crash-window completion, worst window: the merged rewrite is
    // durable only in tmp, the originals are ALREADY DELETED, and the
    // root manifest (the commit point, deleted last) still names them.
    // The next call must finish the swap before reading — zero row loss.
    import org.apache.hadoop.fs.Path
    val root = new Path(fdir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirNames = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName).sortBy(_.stripPrefix("batch=").toLong).toSeq
    val tmp = new Path(root, ".compact_tmp_batches")
    spark.read.parquet(dirNames.map(n => s"$fdir/$n"): _*)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    fs.create(new Path(tmp, "_merged"), true).close()
    val man = fs.create(new Path(root, ".compact_manifest"), true)
    man.write(dirNames.mkString("\n").getBytes("UTF-8")); man.close()
    dirNames.foreach(n => fs.delete(new Path(root, n), true)) // the crash
    assert(nDirs === 0, "crash state should hold data only in tmp")
    val (b2, a2) = MmFeatures.compactBatches(spark, fdir, keepLast = 1)
    assert(nDirs === 1 && b2 === 1 && a2 === 1)
    val recovered = MmFeatures.read(spark, fdir).collect()
      .map(_.toString).sorted
    assert(recovered.toSeq === before.toSeq, "crash-window swap lost rows")

    // Post-rename crash: manifest outlives a completed swap (dest carries
    // the _merged marker). Re-running must treat dest as the merged
    // output — NOT an original to delete — and just clear the manifest.
    val man2 = fs.create(new Path(root, ".compact_manifest"), true)
    man2.write(dirNames.mkString("\n").getBytes("UTF-8")); man2.close()
    val (b3, a3) = MmFeatures.compactBatches(spark, fdir, keepLast = 1)
    assert(b3 === 1 && a3 === 1)
    assert(!fs.exists(new Path(root, ".compact_manifest")))
    val stillThere = MmFeatures.read(spark, fdir).collect()
      .map(_.toString).sorted
    assert(stillThere.toSeq === before.toSeq,
      "post-rename recovery deleted the merged data")
  }

  test("replayed batch overwrites its own output — exactly-once without a log") {
    val fdir = tempDir("fs_replay")
    val s = spark
    import s.implicits._
    val ids = imageIds.as[Long].take(30).toSeq
    val batch = spark.createDataset(ids).toDF("doc_id")
    FeatureStream.applyBatch(batch, 7L, fdir)
    val once = MmFeatures.read(spark, fdir).collect().map(_.toString).sorted
    // A crash between sink write and checkpoint commit replays the batch.
    FeatureStream.applyBatch(batch, 7L, fdir)
    val twice = MmFeatures.read(spark, fdir).collect().map(_.toString).sorted
    assert(twice.toSeq === once.toSeq, "replay duplicated or altered rows")
  }
}
