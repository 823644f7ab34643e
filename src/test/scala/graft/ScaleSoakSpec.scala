package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Scale soak for the headline dedup path, gated behind GRAFT_SOAK=1 so CI
  * stays fast: replicate the documents corpus k× with DISTINCT text per
  * replica (a replica-index token is appended, so no cross-replica
  * near-dups exist and the true pair count grows linearly in k). The
  * assertion is about growth SHAPE: found pairs scale exactly linearly,
  * and wall-clock grows sub-quadratically — the candidate join stays
  * bucket-bounded instead of degenerating toward all-pairs. */
class ScaleSoakSpec extends SparkSpec {

  private def corpusTimes(k: Int) = {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    // Every token carries the replica index, so shingle sets across
    // replicas are fully disjoint — no cross-replica near-dups, and the
    // true pair count is exactly linear in k.
    val reps = (0 until k).map { r =>
      d.select(
        (col("doc_id") + r * 10000000L).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1r$r").as("text"))
    }.reduce(_ unionAll _)
    reps.select(col("doc_id"), col("text"))
      .unionAll(reps.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
  }

  test("minhash dedup scales linearly in corpus replication") {
    assume(sys.env.get("GRAFT_SOAK").contains("1"),
      "soak disabled (set GRAFT_SOAK=1)")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()

    def run(k: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashPairs(corpusTimes(k)).count()
      (pairs, (System.nanoTime() - t0) / 1e9)
    }
    run(1) // warm-up: JIT + codegen
    val (p1, t1) = run(1)
    val (p5, t5) = run(5)
    info(f"1x: $p1 pairs in $t1%.1f s;  5x: $p5 pairs in $t5%.1f s")
    assert(p5 === 5 * p1, "pair count must grow exactly linearly")
    assert(t5 <= t1 * 12,
      f"5x corpus took ${t5 / t1}%.1f x the time — candidate join degenerating")
  }
}
