package graft

import graft.llm.Dedup
import graft.streaming.CurateStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end proof of the streaming curation contract: gate → incremental
  * LSH dedup → idempotent state, across waves and checkpoint restarts,
  * with the final keep set EQUAL to a from-scratch batch dedup of the
  * full corpus. */
class CurateStreamSpec extends SparkSpec {

  /** sf0.001 documents + first-word-dropped variants (the standard
    * near-dup construction), plus a few gate-rejected rows. */
  private def corpus: DataFrame = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    val variants = d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+\\s+", "").as("text"),
      col("lang"), col("n_chars"))
    val rejects = d.limit(3).select(
      (col("doc_id") + 2000000).as("doc_id"), col("text"),
      lit("xx").as("lang"), col("n_chars"))
    d.unionByName(variants).unionByName(rejects)
  }

  test("streamed waves reproduce the batch keep set exactly; gate applies; replay is a no-op") {
    val landing = tempDir("curate-landing")
    val state = tempDir("curate-state")
    val cp = tempDir("curate-cp")
    val full = corpus.cache()

    // Three waves split by id mod 3, so most near-dup partners arrive in
    // DIFFERENT waves and the cross-batch index join does the work.
    (0 to 2).foreach { wave =>
      full.filter(pmod(col("doc_id"), lit(3)) === wave)
        .write.mode("append").parquet(landing)
      // Each call is a fresh streaming query resuming from the same
      // checkpoint — i.e. a restart per wave.
      CurateStream.runAvailableNow(spark, landing, state, cp,
        maxFilesPerTrigger = 2)
    }

    // Gate: the lang="xx" rows never entered state.
    val ingested = spark.read.parquet(s"$state/docs")
    assert(ingested.filter(col("doc_id") >= 2000000).count() === 0)
    assert(ingested.count() === full.count() - 3)

    // The streaming keep set == from-scratch batch dedup of the gated corpus.
    val gated = full.filter(col("lang") =!= "xx")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val batchKeep = Dedup.keepSet(gated, Dedup.minhashPairs(gated))
    val streamKeep = CurateStream.survivors(spark, state)
    assert(streamKeep.except(batchKeep).count() === 0,
      "stream kept docs the batch dedup drops")
    assert(batchKeep.except(streamKeep).count() === 0,
      "stream dropped docs the batch dedup keeps")

    // Replay with no new files: state unchanged (idempotence).
    val pairsBefore = spark.read.parquet(s"$state/pairs").count()
    val docsBefore = ingested.count()
    CurateStream.runAvailableNow(spark, landing, state, cp)
    assert(spark.read.parquet(s"$state/pairs").count() === pairsBefore)
    assert(spark.read.parquet(s"$state/docs").count() === docsBefore)
    full.unpersist()
  }

  test("per-batch work joins the index, not the corpus (incremental plan shape)") {
    // incrementPairs' candidate join must consume the PERSISTED band index
    // as a plain scan — the increment never re-shingles old text.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val idxBands = Dedup.bandsOf(docs)
    val idxSets = Dedup.setsOf(docs)
    val batch = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val pairs = Dedup.incrementPairs(batch, idxBands, idxSets).cache()
    // Every emitted pair touches a batch doc (ids ≥ 1e6; pairs are
    // (least, greatest)-normalized, so doc_b is always the batch side).
    assert(pairs.filter(col("doc_b") < 1000000).count() === 0)
    // Each copy pairs with its source at jaccard 1.0 (plus whatever
    // natural near-dups the source already had — not asserted away).
    val expected = (0L until 5L).map(i => (i, i + 1000000L)).toSet
    val got = pairs.filter(col("jaccard") === 1.0)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(expected.subsetOf(got), s"missing source-copy pairs: ${expected -- got}")
    pairs.unpersist()
  }
}
