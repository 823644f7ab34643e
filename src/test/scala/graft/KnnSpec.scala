package graft

import graft.llm.{Knn, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ANN quality gate: LSH top-10 must retrieve ≥ 0.9 of the exact top-10 on
  * the planted-neighbor corpus (where true near neighbors exist — uniform
  * random embeddings have none, and no sublinear method can rank noise). */
class KnnSpec extends SparkSpec {

  test("LSH ANN recall@10 >= 0.9 vs brute force on planted corpus") {
    val base = Tables.load(spark, sfDir, "embeddings")
      .withColumn("ve", VectorOps.asDouble("embedding"))
      .select(col("vec_id"), col("ve"))
    val corpus = Knn.plantedCorpus(base)
    val queries = base.filter(col("vec_id") < 20)

    val exact = Knn.bruteTopK(corpus, queries, 10)
      .select("query_id", "neighbor_id")
    val ann = Knn.lshTopK(corpus, queries, 10)
      .select("query_id", "neighbor_id")

    val nExact = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / nExact
    info(f"recall@10 = $recall%.3f ($hit/$nExact)")
    assert(nExact === 200L) // 20 queries × 10
    assert(recall >= 0.9, f"ANN recall too low: $recall%.3f")
  }
}
