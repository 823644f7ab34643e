package graft

import graft.llm.Dedup
import graft.sources.SortedRunIndex
import org.apache.spark.sql.functions._

/** The SortedRunIndex contract: probes return exactly the matching rows'
  * superset, pruning actually skips run files, compaction folds deltas
  * without changing the table, every crash window recovers, and the
  * indexed incremental-dedup path is bit-identical to both flat modes. */
class SortedRunIndexSpec extends SparkSpec {

  private def table(n: Long) = {
    val s = spark
    import s.implicits._
    // key = a 64-bit-spread hash; payload checks row integrity end-to-end.
    spark.range(n).select(xxhash64(col("id")).as("k"), col("id").as("payload"))
  }

  test("append → compact → probe: pruned probe equals a full-scan filter") {
    val root = tempDir("sri")
    val df = table(20000)
    // Three deltas; compact keepLast=0 folds all of them.
    (0 to 2).foreach { b =>
      SortedRunIndex.append(df.filter(pmod(col("payload"), lit(3)) === b), root, b)
    }
    val (folded, files) = SortedRunIndex.compact(spark, root, "k", 512, keepLast = 0)
    assert(folded === 3 && files >= 20000 / 512)

    val all = SortedRunIndex.readAll(spark, root, df.limit(0))
    assert(all.count() === 20000)

    // Disjoint sorted ranges: k probe keys intersect ≤ k of the run's
    // files, however many files (= however much index) there are.
    val keys = df.filter(col("payload") < 5).select("k").collect().map(_.getLong(0))
    val (selected, total) = SortedRunIndex.selectFiles(spark, root, keys)
    assert(total === files)
    assert(selected.nonEmpty && selected.size <= keys.length,
      s"one probe key intersects at most one disjoint-range file (${selected.size} vs ${keys.length})")

    val probed = SortedRunIndex.probe(spark, root, keys, df.limit(0))
      .filter(col("k").isin(keys.toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = df.filter(col("payload") < 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed === expect)
  }

  test("deltas newer than the run are probed whole; keepLast protects them") {
    val root = tempDir("sri2")
    val df = table(5000)
    SortedRunIndex.append(df.filter(col("payload") < 4000), root, 0)
    val (f1, _) = SortedRunIndex.compact(spark, root, "k", 256, keepLast = 0)
    assert(f1 === 1)
    // A post-compaction delta must be visible without any maintenance.
    SortedRunIndex.append(df.filter(col("payload") >= 4000), root, 1)
    val keys = df.select("k").collect().map(_.getLong(0))
    assert(SortedRunIndex.probe(spark, root, keys, df.limit(0)).count() === 5000)
    // keepLast=1 has nothing older than the newest delta to fold: no-op.
    assert(SortedRunIndex.compact(spark, root, "k", 256, keepLast = 1) === ((0, 0)))
    // Second compaction (a new generation) folds it and stays equal.
    val (f2, _) = SortedRunIndex.compact(spark, root, "k", 256, keepLast = 0)
    assert(f2 === 1)
    assert(SortedRunIndex.readAll(spark, root, df.limit(0)).count() === 5000)
    assert(SortedRunIndex.probe(spark, root, keys, df.limit(0)).count() === 5000)
  }

  test("crash windows: manifest-committed tmp and post-rename leftovers both recover") {
    import org.apache.hadoop.fs.Path
    val root = tempDir("sri3")
    val df = table(3000)
    SortedRunIndex.append(df, root, 0)
    SortedRunIndex.compact(spark, root, "k", 256, keepLast = 0)
    val rows = SortedRunIndex.readAll(spark, root, df.limit(0))
      .collect().map(_.toString).sorted.toSeq

    val rootP = new Path(root)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Worst window: new run durable only in tmp, old run already deleted,
    // manifest still present. (Simulate by hand-moving run=0 into tmp.)
    val tmp = new Path(rootP, "compact-tmp")
    assert(fs.rename(new Path(rootP, "run=0"), tmp))
    val man = fs.create(new Path(rootP, ".compact_manifest"), true)
    man.write("run=1\nrun=0".getBytes("UTF-8")); man.close()
    // tmp already carries _merged (it was a completed run).
    val recovered = SortedRunIndex.readAll(spark, root, df.limit(0))
      .collect().map(_.toString).sorted.toSeq
    assert(recovered === rows, "tmp-only crash window lost rows")
    assert(fs.exists(new Path(rootP, "run=1")) &&
      !fs.exists(new Path(rootP, ".compact_manifest")))

    // Post-rename window: manifest survives a completed swap. The dest's
    // _merged marker must stop recovery from deleting the merged run.
    val man2 = fs.create(new Path(rootP, ".compact_manifest"), true)
    man2.write("run=1\nrun=0".getBytes("UTF-8")); man2.close()
    val again = SortedRunIndex.readAll(spark, root, df.limit(0))
      .collect().map(_.toString).sorted.toSeq
    assert(again === rows, "post-rename recovery deleted the merged run")
    assert(!fs.exists(new Path(rootP, ".compact_manifest")))
  }

  test("indexed incremental dedup is bit-identical to both flat modes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val root = tempDir("sri4")
    // Index the corpus in two batches, compact everything, then add one
    // uncompacted delta batch — the probe must see runs AND deltas.
    val (b0, b1, b2) = (
      docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      docs.filter(pmod(col("doc_id"), lit(3)) === 2))
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      SortedRunIndex.append(Dedup.bandsOf(b), s"$root/bands", i)
      SortedRunIndex.append(Dedup.setsOf(b), s"$root/sets", i)
    }
    graft.streaming.CurateStream.maintain(spark, root, keepLast = 0)
    SortedRunIndex.append(Dedup.bandsOf(b2), s"$root/bands", 2)
    SortedRunIndex.append(Dedup.setsOf(b2), s"$root/sets", 2)

    val batch = docs.filter(col("doc_id") < 40)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val indexed = Dedup.incrementPairsIndexed(batch, root)
      .collect().map(key).toSet
    val idxBands = Dedup.bandsOf(docs)
    val idxSets = Dedup.setsOf(docs)
    val bcast = Dedup.incrementPairs(batch, idxBands, idxSets,
      broadcastIncrement = true).collect().map(key).toSet
    val merge = Dedup.incrementPairs(batch, idxBands, idxSets,
      broadcastIncrement = false).collect().map(key).toSet
    assert(indexed === bcast, "indexed vs broadcast mode diverged")
    assert(indexed === merge, "indexed vs merge mode diverged")
    assert(indexed.nonEmpty, "no pairs found — the fixture lost its teeth")
  }
}
