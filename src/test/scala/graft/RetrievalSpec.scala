package graft

import graft.llm.{Retrieval, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Invariants for the retrieval-curation operators (hybrid RRF, hard
  * negatives, prototypicality) beyond the DuckDB hash gate: semantic
  * properties that must hold for ANY corpus, plus the plan shapes that
  * keep them scale-sound. */
class RetrievalSpec extends SparkSpec {

  private def base = Tables.load(spark, sfDir, "embeddings")
    .withColumn("ve", VectorOps.asDouble("embedding"))
    .select(col("vec_id"), col("label"), col("ve"))

  test("hard negatives never share the query's label; dense ranks; scores ordered") {
    val hn = Retrieval.hardNegatives(base, base.filter(col("vec_id") < 10), k = 5)
      .cache()
    assert(hn.filter(col("qlabel") === col("nlabel")).count() === 0)
    // Every query gets exactly ranks 1..5.
    val perQ = hn.groupBy("query_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perQ.filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() === 0)
    assert(perQ.count() === 10)
    // Cosine non-increasing with rank within each query.
    val inv = hn.as("a").join(hn.as("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rank") < col("b.rank") &&
        col("a.cosine") < col("b.cosine"))
    assert(inv.count() === 0)
    hn.unpersist()
  }

  test("hard-negative mining is a broadcast pass over the corpus (no shuffle join)") {
    val hn = Retrieval.hardNegatives(base, base.filter(col("vec_id") < 10), k = 5)
    val plan = hn.queryExecution.executedPlan.toString
    // Label-inequality join with a broadcast tiny query side: any broadcast
    // join variant is fine; a shuffle join of the corpus is not.
    assert(plan.contains("Broadcast"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join in:\n$plan")
  }

  test("prototypicality: rank-1 vector is the label's true cosine-minimum") {
    val protos = Retrieval.prototypicality(base, k = 5).cache()
    val perLabel = protos.groupBy("label").agg(count(lit(1)).as("n"))
    assert(perLabel.filter(col("n") =!= 5).count() === 0)
    // Recompute every vector's centroid cosine independently and check the
    // reported rank-1 row matches the global minimum per label.
    val full = Retrieval.prototypicality(base, k = Int.MaxValue)
    val mins = full.groupBy("label").agg(min("cosine").as("mc"))
    val r1 = protos.filter(col("rank") === 1)
      .join(mins, "label")
    assert(r1.filter(col("cosine") =!= col("mc")).count() === 0)
    protos.unpersist()
  }

  test("RRF fusion: a doc ranked by both legs beats single-leg docs at equal ranks") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = base.select(col("vec_id"), col("ve"))
    val fused = Retrieval.rrfFuse(
      Retrieval.bm25Top(docs, 100), Retrieval.vectorTop(corpus, 0L, 100), 50)
      .cache()
    assert(fused.count() <= 50)
    // Scores strictly positive, bounded by the two-leg maximum 2/61.
    assert(fused.filter(col("rrf_score") <= 0 ||
      col("rrf_score") > 2.0 / 61.0 + 1e-12).count() === 0)
    // Descending by construction: max score first.
    val top = fused.orderBy(col("rrf_score").desc).head()
    val mx = fused.agg(max("rrf_score")).head().getDouble(0)
    assert(top.getAs[Double]("rrf_score") === mx)
    // Additivity: where both ranks exist the score is exactly the sum.
    val both = fused.filter(col("bm25_rank").isNotNull && col("vec_rank").isNotNull)
      .withColumn("expect",
        lit(1.0) / (lit(60) + col("bm25_rank")) + lit(1.0) / (lit(60) + col("vec_rank")))
    assert(both.filter(col("rrf_score") =!= col("expect")).count() === 0)
    fused.unpersist()
  }
}
