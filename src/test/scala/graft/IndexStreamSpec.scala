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
}
