package graft

import graft.llm.{VectorIndex, VectorOps}
import graft.sources.Tables
import graft.streaming.IndexStream
import org.apache.spark.sql.functions._

/** Streamed index maintenance ≡ batch assignment: after waves, restarts,
  * and replays, the accumulated codes equal one frozen-param assignment of
  * everything ingested — so queries can't tell the index was streamed. */
class IndexStreamSpec extends SparkSpec {

  private def base = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), col("embedding"), col("label"))

  test("streamed waves build the same index as frozen-param batch assignment") {
    val landing = tempDir("idxstream_landing")
    val idx = tempDir("idxstream_idx")
    val cp = tempDir("idxstream_cp")

    // Three waves land as separate files; each drain is a fresh
    // AvailableNow run against the SAME checkpoint (restart between
    // waves exercises offset recovery).
    (0 to 2).foreach { wave =>
      base.filter(pmod(col("vec_id"), lit(3)) === wave)
        .coalesce(1).write.mode("append").parquet(landing)
      IndexStream.runAvailableNow(spark, landing, idx, cp,
        maxFilesPerTrigger = 1)
    }

    // Reference: one-shot assignment of every ingested vector against the
    // tables wave 0 froze.
    val cents = spark.read.parquet(s"$idx/centroids")
    val cb = spark.read.parquet(s"$idx/codebook")
    val all = base.select(col("vec_id"), VectorOps.asDouble("embedding").as("ve"))
    val expected = VectorIndex.assignCodes(all, cents, cb)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).mkString(",")))
      .sorted.toSeq
    val got = VectorIndex.codes(spark, idx)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Int]]("code").mkString(",")))
      .sorted.toSeq
    assert(got === expected)
    assert(got.size.toLong === base.count())

    // The frozen geometry comes from wave 0 only: centroid count matches
    // √(|wave 0|) sizing, not √(|corpus|).
    val w0 = base.filter(pmod(col("vec_id"), lit(3)) === 0).count()
    val p = VectorIndex.paramsFor(w0)
    val expectedCents = all.filter(pmod(col("vec_id"), lit(3)) === 0)
      .filter(col("vec_id") % p.centroidMod === 0).count()
    assert(cents.count() === expectedCents)

    // Replay: re-running a drained stream is a no-op (no new files, no new
    // batches), and manually re-applying a wave's batch overwrites its own
    // dir without duplicating.
    IndexStream.runAvailableNow(spark, landing, idx, cp, maxFilesPerTrigger = 1)
    assert(VectorIndex.codes(spark, idx).count() === base.count())

    // A query over the streamed index works end to end.
    val res = VectorIndex.query(spark, idx,
      all.filter(col("vec_id") < 5), k = 5, nprobe = 4)
    assert(res.groupBy("query_id").count().count() === 5)
  }

  test("incremental semantic dedup == batch pair scan with frozen geometry") {
    val landing = tempDir("semstream_landing")
    val idx = tempDir("semstream_idx")
    val cp = tempDir("semstream_cp")

    // Corpus = base embeddings + exact duplicates of ids < 30, planted in
    // a DIFFERENT wave than their original (wave = (id%3 + 1) % 3), so
    // most duplicate pairs are cross-batch — the case that distinguishes
    // incremental from per-batch dedup.
    val dups = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 7000000L).as("vec_id"), col("embedding"),
        col("label"))
    val all = base.unionAll(dups)
    def waveOf = when(col("vec_id") >= 7000000L,
        pmod(pmod(col("vec_id") - 7000000L, lit(3)) + 1, lit(3)))
      .otherwise(pmod(col("vec_id"), lit(3)))
    (0 to 2).foreach { wave =>
      all.filter(waveOf === wave)
        .coalesce(1).write.mode("append").parquet(landing)
      IndexStream.runAvailableNow(spark, landing, idx, cp,
        maxFilesPerTrigger = 1, semanticTau = Some(0.95))
    }

    // Reference: ONE pair scan of everything ingested under the geometry
    // wave 0 froze — same-cell, a < b, exact cosine >= tau; drop every b.
    val cents = spark.read.parquet(s"$idx/centroids")
    val cb = spark.read.parquet(s"$idx/codebook")
    val ve = all.select(col("vec_id"), VectorOps.asDouble("embedding").as("ve"))
    val av = VectorIndex.assignCodes(ve, cents, cb).select("vec_id", "cell")
      .join(ve, "vec_id")
    val dropped = av.select(col("cell"), col("vec_id").as("ia"), col("ve").as("va"))
      .join(av.select(col("cell"), col("vec_id").as("ib"), col("ve").as("vb")), "cell")
      .filter(col("ia") < col("ib"))
      .filter(VectorOps.cosine("va", "vb") >= 0.95)
      .select(col("ib")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "planted duplicates produced no pairs")
    val expected = ve.select("vec_id").collect().map(_.getLong(0)).toSet -- dropped

    val got = IndexStream.survivors(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // Every planted duplicate (greater id than its original) was dropped.
    assert(dups.collect().map(_.getLong(0)).toSet.intersect(got).isEmpty)

    // Replay: a drained stream re-run changes nothing.
    IndexStream.runAvailableNow(spark, landing, idx, cp,
      maxFilesPerTrigger = 1, semanticTau = Some(0.95))
    assert(IndexStream.survivors(spark, idx)
      .collect().map(_.getLong(0)).toSet === expected)
  }
}
