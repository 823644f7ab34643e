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

  test("a committed crash leftover is completed without duplicating rows") {
    val s = spark
    import s.implicits._
    val dir = tempDir("compact_recover")
    val part = "event_date=2024-03-01"
    (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(10).write.mode("overwrite").parquet(s"$dir/$part")
    val before = spark.read.parquet(s"$dir/$part").orderBy("id").collect()

    // Simulate a crash AFTER the commit point: the rewrite and its
    // originals manifest exist, but the swap never ran.
    val tmp = s"$dir/.compact_tmp_$part"
    spark.read.parquet(s"$dir/$part").repartition(1)
      .write.mode("overwrite").parquet(tmp)
    val originals = new java.io.File(s"$dir/$part").listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "_originals"),
      originals.map(f => s"file:${f.getAbsolutePath}").mkString("\n"))

    val (nBefore, nAfter) = graft.streaming.Maintenance
      .compactPartition(spark, dir, part, targetFileMB = 128)
    val recovered = spark.read.parquet(s"$dir/$part").orderBy("id").collect()
    assert(recovered === before, "recovery lost or duplicated rows")
    assert(nBefore === 1 && nAfter === 1, "recovered partition should already be compact")
    assert(!new java.io.File(tmp).exists(), "tmp dir must be cleaned up")
  }

  test("an uncommitted crash leftover is discarded, data untouched") {
    val s = spark
    import s.implicits._
    val dir = tempDir("compact_discard")
    val part = "event_date=2024-03-02"
    (1 to 300).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(6).write.mode("overwrite").parquet(s"$dir/$part")
    val before = spark.read.parquet(s"$dir/$part").orderBy("id").collect()

    // Crash BEFORE the commit point: rewrite files but no manifest.
    val tmp = s"$dir/.compact_tmp_$part"
    (1 to 10).map(i => (i.toLong, "junk")).toDF("id", "v")
      .write.mode("overwrite").parquet(tmp)
    // (the parquet _SUCCESS marker alone must NOT count as committed)

    val (nBefore, nAfter) = graft.streaming.Maintenance
      .compactPartition(spark, dir, part, targetFileMB = 128)
    assert(nBefore === 6 && nAfter === 1)
    val after = spark.read.parquet(s"$dir/$part").orderBy("id").collect()
    assert(after === before, "discard path corrupted the partition")
    assert(!new java.io.File(tmp).exists())
  }

  test("uncommitted orphan files are excluded from the rewrite, not baked in") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = tempDir("compact_orphan")
    val cp = tempDir("compact_orphan_cp")
    // A REAL streaming-sink table, so _spark_metadata enumerates exactly
    // the committed files.
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .withColumn("event_date", lit("2024-03-01"))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", dir).option("checkpointLocation", cp)
      .outputMode("append").start()
    mem.addData((1 to 100).map(i => (i.toLong, s"v$i")): _*)
    q.processAllAvailable()
    mem.addData((101 to 120).map(i => (i.toLong, s"v$i")): _*)
    q.processAllAvailable()
    q.stop()
    val committedRows = spark.read.parquet(dir).count()
    assert(committedRows === 120L)

    // Plant an ORPHAN: a data file in the partition the commit log never
    // admitted (the shape an aborted micro-batch task leaves behind).
    // Metadata-aware reads don't see it...
    val part = s"$dir/event_date=2024-03-01"
    (9000 to 9049).map(i => (i.toLong, "orphan")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.orphan_stage")
    val orphanSrc = new java.io.File(s"$dir/.orphan_stage").listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val orphanDest = new java.io.File(part, "part-99999-orphan.parquet")
    java.nio.file.Files.copy(orphanSrc.toPath, orphanDest.toPath)
    assert(spark.read.parquet(dir).count() === 120L,
      "metadata-aware read must not see the orphan")

    // ...and neither may the compacted table.
    Maintenance.compactTable(spark, dir, targetFileMB = 128)
    val after = spark.read.parquet(dir)
    assert(after.count() === 120L,
      "compaction baked uncommitted orphan rows into the table")
    assert(after.filter($"v" === "orphan").isEmpty)
    assert(!orphanDest.exists(), "orphan file must be garbage-collected")
  }

  test("z-ordered compaction tolerates null dimension values and all-null dims") {
    val s = spark
    import s.implicits._
    val dir = tempDir("compact_zorder_nulls")
    val part = "event_date=2024-03-01"
    // x nullable on a third of rows; y ENTIRELY null (the NPE shape: the
    // min/max stats row is null, and null values must land in a
    // deterministic block, not ride null-propagation into an arbitrary one).
    (0 until 600).map { i =>
      (i.toLong,
        if (i % 3 == 0) None else Some(i.toLong % 512),
        None: Option[Long])
    }.toDF("id", "x", "y")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/$part")
    val before = spark.read.parquet(s"$dir/$part").orderBy("id").collect()

    val (nBefore, nAfter) = Maintenance.compactPartition(
      spark, dir, part, zorder = Some(("x", "y")),
      targetFilesOverride = Some(2))
    assert(nBefore === 8 && nAfter <= 2 && nAfter >= 1)
    val after = spark.read.parquet(s"$dir/$part").orderBy("id").collect()
    assert(after === before, "null-dim z-order rewrite changed table contents")
  }

  test("z-ordered compaction clusters every output file in BOTH dimensions") {
    val s = spark
    import s.implicits._
    val dir = tempDir("compact_zorder")
    val part = "event_date=2024-03-01"
    // Uniform 2D data (seeded hash spread) in 16 fragments.
    val n = 8192
    (0 until n).map { i =>
      val h = scala.util.hashing.MurmurHash3.stringHash(s"z$i").toLong & 0xffffffffL
      (i.toLong, h % 4096, (h / 4096) % 4096)
    }.toDF("id", "x", "y")
      .repartition(16).write.mode("overwrite").parquet(s"$dir/$part")
    val before = spark.read.parquet(s"$dir/$part").orderBy("id").collect()

    val (nBefore, nAfter) = Maintenance.compactPartition(
      spark, dir, part, zorder = Some(("x", "y")),
      targetFilesOverride = Some(4))
    assert(nBefore === 16 && nAfter === 4)

    // Content preserved exactly.
    val after = spark.read.parquet(s"$dir/$part").orderBy("id").collect()
    assert(after === before, "z-ordered rewrite changed table contents")

    // Every output FILE must be tight in both x and y: with ≥4 z-range
    // files over uniform data, each covers about half the domain per
    // dimension. A lexicographic (x, y) sort would leave y at full span.
    val files = new java.io.File(s"$dir/$part").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length >= 4, s"expected >= 4 output files, got ${files.length}")
    files.foreach { f =>
      val st = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      val spanX = st.getLong(1) - st.getLong(0)
      val spanY = st.getLong(3) - st.getLong(2)
      assert(spanX <= 2600 && spanY <= 2600,
        s"file $f spans x=$spanX y=$spanY of 4096 — not z-clustered")
    }
  }

  test("deleteWhere rewrites only matching files; untouched files stay byte-identical") {
    val s = spark
    import s.implicits._
    val dir = tempDir("delete_where")
    // 2 partitions × 10 files; user 7's rows land only in SOME files.
    (1 to 2000).map(i => (i.toLong, i % 40, s"d${i % 2 + 1}"))
      .toDF("id", "user_id", "event_date")
      .repartition(10, col("id"))
      .write.partitionBy("event_date").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect()
    val expectKept = before.filterNot(r => r.getInt(1) == 7)
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir))
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val filesBefore = snapshot()

    val report = Maintenance.deleteWhere(spark, dir, "user_id = 7")
    assert(report.rowsDeleted === before.count(_.getInt(1) == 7).toLong)
    assert(report.filesRewritten > 0 && report.filesRewritten < report.filesTotal,
      s"delete must touch a strict subset of files: $report")

    // Exact surviving content.
    val after = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("user_id"),
        r.getAs[String]("event_date"))).sorted.toSeq
    assert(after === expectKept, "delete changed non-matching rows")

    // Files without matches are THE SAME files (path, size, mtime) —
    // physically untouched, not rewritten-equal.
    val filesAfter = snapshot()
    val untouched = filesBefore.keySet.intersect(filesAfter.keySet)
    assert(untouched.nonEmpty)
    untouched.foreach(p => assert(filesBefore(p) === filesAfter(p), s"$p was modified"))
    assert(filesBefore.size - untouched.size === report.filesRewritten)

    // Idempotence: a second run deletes nothing and touches nothing.
    val again = Maintenance.deleteWhere(spark, dir, "user_id = 7")
    assert(again.rowsDeleted === 0L && again.filesRewritten === 0)
    assert(snapshot() === filesAfter)
  }

  test("deleteWhere: NULL predicate rows are kept; partition predicate prunes whole dirs") {
    val s = spark
    import s.implicits._
    val dir = tempDir("delete_null")
    Seq((1L, Some(1)), (2L, None), (3L, Some(3)), (4L, None))
      .toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // v = 1 is TRUE only for id=1; NULL for ids 2 and 4 — both KEPT.
    val rep = Maintenance.deleteWhere(spark, dir, "v = 1")
    assert(rep.rowsDeleted === 1L)
    assert(spark.read.parquet(dir).select("id").as[Long].collect().sorted
      === Array(2L, 3L, 4L))

    // Partition-column predicate: deletes a whole partition's rows, other
    // partition physically untouched.
    val dir2 = tempDir("delete_part")
    (1 to 100).map(i => (i.toLong, s"d${i % 2}"))
      .toDF("id", "part").repartition(2)
      .write.partitionBy("part").mode("overwrite").parquet(dir2)
    val rep2 = Maintenance.deleteWhere(spark, dir2, "part = 'd1'")
    assert(rep2.rowsDeleted === 50L)
    val left = spark.read.parquet(dir2)
    assert(left.count() === 50L)
    assert(left.filter(col("part") === "d1").count() === 0L)
    // The schema written back must not carry the partition column twice:
    // a fresh read still derives `part` from the directory layout.
    assert(left.columns.toSeq.count(_ == "part") === 1)
  }

  test("deleteWhere on a logged table retires the log; vacuum then spares survivors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = tempDir("delete_logged")
    val cp = tempDir("delete_logged_cp")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .withColumn("event_date", lit("2024-03-01"))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", dir).option("checkpointLocation", cp)
      .outputMode("append").start()
    mem.addData((1 to 60).map(i => (i.toLong, s"v$i")): _*)
    q.processAllAvailable()
    q.stop()
    // Plant an uncommitted orphan: its rows are invisible now and must
    // NOT become visible when the delete retires the log.
    val part = s"$dir/event_date=2024-03-01"
    Seq((7777L, "orphan")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage2")
    val src2 = new java.io.File(s"$dir/.stage2").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(src2.toPath,
      new java.io.File(part, "part-88888-orphan.parquet").toPath)

    // A FRESH uncommitted file is evidence of an active writer (a
    // mid-commit micro-batch): the delete must REFUSE — GC'ing it and
    // retiring the log would break the in-flight batch's commit.
    val refused = intercept[IllegalArgumentException] {
      Maintenance.deleteWhere(spark, dir, "id <= 10")
    }
    assert(refused.getMessage.contains("orphan-retention"))
    assert(new java.io.File(s"$dir/_spark_metadata").exists(),
      "refused delete must leave the commit log in place")
    // Aged beyond the retention window it is a dead task's leftover and
    // the sweep proceeds.
    assert(new java.io.File(part, "part-88888-orphan.parquet")
      .setLastModified(System.currentTimeMillis - 60 * 60 * 1000L))
    val rep = Maintenance.deleteWhere(spark, dir, "id <= 10")
    assert(rep.rowsDeleted === 10L)
    // The stale sink log named the pre-rewrite files — it must be gone,
    // and the listed read must see exactly the surviving committed rows.
    assert(!new java.io.File(s"$dir/_spark_metadata").exists(),
      "rewriting delete must retire the sink commit log")
    val after = spark.read.parquet(dir)
    assert(after.count() === 50L)
    assert(after.filter($"v" === "orphan").isEmpty,
      "uncommitted orphan rows leaked into the post-delete table")
    // The round-trip that used to lose data: a vacuum after the delete
    // must keep every survivor (no log -> files are presumed live).
    val now = System.currentTimeMillis
    new java.io.File(part).listFiles().foreach(
      _.setLastModified(now - 10 * 60 * 60 * 1000L))
    Maintenance.vacuum(spark, dir, retentionMs = 60 * 60 * 1000L, now)
    assert(spark.read.parquet(dir).count() === 50L,
      "vacuum deleted live rewritten files")
  }

  test("vacuum removes aged orphans + stale scratch, never live or fresh files") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = tempDir("vacuum_tbl")
    val cp = tempDir("vacuum_cp")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v")
      .withColumn("event_date", lit("2024-03-01"))
      .writeStream.format("parquet")
      .partitionBy("event_date")
      .option("path", dir).option("checkpointLocation", cp)
      .outputMode("append").start()
    mem.addData((1 to 80).map(i => (i.toLong, s"v$i")): _*)
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(dir).count() === 80L)

    // Plant: an OLD orphan (uncommitted, aged past retention), a FRESH
    // orphan (uncommitted but recent — could be a mid-commit batch), and
    // a stale pre-commit scratch dir (no _originals manifest).
    val part = s"$dir/event_date=2024-03-01"
    Seq((9001L, "orphan")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage")
    val src = new java.io.File(s"$dir/.stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val oldOrphan = new java.io.File(part, "part-99990-orphan.parquet")
    val freshOrphan = new java.io.File(part, "part-99991-orphan.parquet")
    java.nio.file.Files.copy(src.toPath, oldOrphan.toPath)
    java.nio.file.Files.copy(src.toPath, freshOrphan.toPath)
    val staleTmp = new java.io.File(s"$dir/.compact_tmp_event_date=2024-03-01")
    staleTmp.mkdirs()
    new java.io.File(staleTmp, "dangling.parquet").createNewFile()

    val now = System.currentTimeMillis
    val retention = 60 * 60 * 1000L // 1 h
    // Age the old orphan and the scratch dir past retention.
    oldOrphan.setLastModified(now - 2 * retention)
    staleTmp.setLastModified(now - 2 * retention)

    val liveBefore = new java.io.File(part).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.contains("orphan")).map(_.getName).toSet
    val rep = Maintenance.vacuum(spark, dir, retention, now)
    assert(rep.orphansDeleted === 1)
    assert(rep.orphanBytes > 0L)
    assert(rep.tmpDirsDeleted === 1)
    assert(!oldOrphan.exists(), "aged orphan must be deleted")
    assert(freshOrphan.exists(), "fresh orphan is inside retention — kept")
    assert(!staleTmp.exists(), "stale scratch dir must be deleted")
    // Every committed file untouched; reads identical.
    val liveAfter = new java.io.File(part).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.contains("orphan")).map(_.getName).toSet
    assert(liveAfter === liveBefore)
    assert(spark.read.parquet(dir).count() === 80L)
    // Idempotent: a second vacuum at the same clock finds nothing.
    val rep2 = Maintenance.vacuum(spark, dir, retention, now)
    assert(rep2.orphansDeleted === 0 && rep2.tmpDirsDeleted === 0)

    // A scratch dir WITH a commit manifest is a pending (committed-but-
    // unapplied) swap: the next maintenance pass rolls it FORWARD;
    // vacuum must never delete it, however old.
    val pending = new java.io.File(s"$dir/.compact_tmp_pending")
    pending.mkdirs()
    new java.io.File(pending, "_originals").createNewFile()
    pending.setLastModified(now - 10 * retention)
    val repP = Maintenance.vacuum(spark, dir, retention, now)
    assert(repP.tmpDirsDeleted === 0)
    assert(pending.exists(), "pending swap dir must survive vacuum")
    new java.io.File(pending, "_originals").delete(); pending.delete()

    // A log-less (plain parquet) table: data files are presumed live even
    // when aged — only scratch dirs are swept.
    val plain = tempDir("vacuum_plain")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(plain)
    new java.io.File(plain).listFiles().foreach(
      _.setLastModified(now - 3 * retention))
    val rep3 = Maintenance.vacuum(spark, plain, retention, now)
    assert(rep3.orphansDeleted === 0)
    assert(spark.read.parquet(plain).count() === 2L)
  }
}
