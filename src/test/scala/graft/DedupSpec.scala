package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the dedup family at sf0.001 (the oracle-differential
  * gate covers exactness at sf0.01; this pins what the oracle can't express).
  */
class DedupSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("minhash-LSH reproduces the exact-Jaccard pair set (recall = 1 here)") {
    val exact = run("llm_dedup_jaccard").select("doc_a", "doc_b")
    val lsh = run("llm_dedup_minhash").select("doc_a", "doc_b")
    assert(exact.except(lsh).count() === 0L, "LSH missed exact pairs")
    assert(lsh.except(exact).count() === 0L, "LSH produced false pairs")
  }

  test("simhash candidates include every constructed near-dup pair") {
    // Every doc and its first-word-dropped variant (id + 1e6) should land
    // within hamming ≤ 6 of each other.
    val pairs = run("llm_dedup_simhash")
      .filter(col("doc_b") === col("doc_a") + 1000000)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val found = pairs.count()
    assert(found >= (nDocs * 9) / 10, s"simhash found $found of $nDocs variant pairs")
    // And hamming distances for those pairs are small in absolute terms.
    assert(pairs.agg(max("hamming")).head.getAs[Number](0).intValue() <= 6)
  }

  test("exact dedup is idempotent and halves the doubled corpus") {
    val out = run("llm_dedup_exact")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.count() === nDocs)                     // one survivor per text
    assert(out.filter(col("n_copies") =!= 2).count() === 0L)
    assert(out.filter(col("doc_id") >= 1000000).count() === 0L) // keeps min id
  }

  test("embedding near-dup finds exactly the constructed pairs") {
    val out = run("llm_dedup_embed")
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.count() === nVecs)
    assert(out.filter(col("vec_b") =!= col("vec_a") + 1000000).count() === 0L)
    assert(out.filter(col("cosine") < 0.99).count() === 0L)
  }
}
