package graft

import graft.llm.{Knn, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** ANN quality gate: LSH top-10 must retrieve the exact top-10 on a corpus
  * where true near neighbors exist (uniform random embeddings have none,
  * and no sublinear method can rank noise).
  *
  * The corpus is deliberately adversarial to parameter-overfitting: the
  * 5.5k planted vectors are swamped by 9× as many deterministic
  * distractors (~55k vectors total, ~100× the base table), so recall and
  * bucket sizes are measured at a scale the LSH parameters were not tuned
  * on. */
class KnnSpec extends SparkSpec {

  test("LSH ANN recall@10 >= 0.95 vs brute force on 10x planted corpus") {
    val base = Tables.load(spark, sfDir, "embeddings")
      .withColumn("ve", VectorOps.asDouble("embedding"))
      .select(col("vec_id"), col("ve"))

    // Distractors: 90 deterministic pseudo-random perturbations per base
    // vector (unique ids far above the planted range). sin() of integer
    // arguments is bit-deterministic, and a ±0.5 shift per dimension puts
    // them far (in cosine) from every query — they exist to fill LSH
    // buckets, not to compete with planted neighbors.
    val distractors = base
      .select(col("vec_id"), col("ve"), explode(expr("sequence(1, 90)")).as("c"))
      .select(
        (col("vec_id") + (col("c") + 10) * 10000000L).as("vec_id"),
        // The replica counter c MUST drive the perturbation: without it all
        // 90 copies of a base vector are byte-identical and the corpus is
        // far weaker than the 54k distinct vectors it claims to be.
        expr("""transform(ve, (x, j) ->
                 x + 0.5 * sin(CAST(j AS DOUBLE) * 2.3
                               + CAST(vec_id AS DOUBLE) * 0.7
                               + CAST(c AS DOUBLE) * 1.31))""")
          .as("ve"))
    val corpus = Knn.plantedCorpus(base).unionAll(distractors).cache()
    val queries = base.filter(col("vec_id") < 20)

    // Bucket telemetry: the LSH join cost is Σ bucket², so the max bucket
    // must stay a small fraction of the corpus or the "sublinear" path
    // degenerates to quadratic.
    val n = corpus.count()
    val buckets = VectorOps.lshCoded(corpus)
      .groupBy("t", "code").count()
      .agg(max("count").as("max"), avg("count").as("avg"))
      .head()
    info(f"corpus=$n  max bucket=${buckets.getLong(0)}  avg bucket=${buckets.getDouble(1)}%.1f")
    assert(buckets.getLong(0) < n / 10,
      s"max LSH bucket ${buckets.getLong(0)} too large for corpus $n")

    val exact = Knn.bruteTopK(corpus, queries, 10)
      .select("query_id", "neighbor_id")
    val ann = Knn.lshTopK(corpus, queries, 10)
      .select("query_id", "neighbor_id")

    val nExact = exact.count()
    val hit = exact.intersect(ann).count()
    val recall = hit.toDouble / nExact
    info(f"recall@10 = $recall%.3f ($hit/$nExact)")
    assert(nExact === 200L) // 20 queries × 10
    assert(recall >= 0.95, f"ANN recall too low: $recall%.3f")
    corpus.unpersist()
  }

  test("IVF ANN recall@10 >= 0.95 vs brute force on planted corpus") {
    val base = Tables.load(spark, sfDir, "embeddings")
      .withColumn("ve", VectorOps.asDouble("embedding"))
      .select(col("vec_id"), col("ve"))
    val corpus = Knn.plantedCorpus(base).cache()
    val queries = base.filter(col("vec_id") < 20)

    val exact = Knn.bruteTopK(corpus, queries, 10)
      .select("query_id", "neighbor_id")
    // Planted neighbors are near-identical to their base vector, so they
    // land in the same Voronoi cell (or an adjacent probed one): nprobe=4
    // of 10 cells must recover nearly all of the true top-10.
    val ivf = Knn.ivfTopK(corpus, queries, 10, nprobe = 4, sampleMod = 50L)
      .select("query_id", "neighbor_id")

    val nExact = exact.count()
    val hit = exact.intersect(ivf).count()
    val recall = hit.toDouble / nExact
    info(f"IVF recall@10 = $recall%.3f ($hit/$nExact)")
    assert(nExact === 200L)
    assert(recall >= 0.95, f"IVF recall too low: $recall%.3f")
    corpus.unpersist()
  }

  test("PQ/ADC: planted exact duplicate is always the top-1 neighbor") {
    // The asymmetric-distance identity that makes PQ correct: for a
    // duplicate of the query, each subspace stores the codeword NEAREST to
    // the query's own subvector, so ADC(q, dup) = Σ_s min_c d(q_s, c) — the
    // pointwise minimum over every possible code. No corpus vector can
    // score strictly lower, so the duplicate must rank first (ties only
    // with code-identical vectors, broken by the smaller planted id).
    val base = Tables.load(spark, sfDir, "embeddings")
      .withColumn("ve", VectorOps.asDouble("embedding"))
      .select(col("vec_id"), col("ve"))
    val queries = base.filter(col("vec_id") < 20)
    // Duplicates planted at vec_id + 5_000_000 (above the corpus range,
    // below any tie candidate's id ordering concerns).
    val corpus = base.unionAll(
      queries.select((col("vec_id") + 5000000L).as("vec_id"), col("ve")))

    val top = Knn.pqTopK(corpus, queries, k = 30)
      .select("query_id", "neighbor_id", "adc").collect()
      .groupBy(_.getLong(0))
    assert(top.size === 20)
    top.foreach { case (q, rows) =>
      val minAdc = rows.map(_.getDouble(2)).min
      val dupAdc = rows.find(_.getLong(1) === q + 5000000L).map(_.getDouble(2))
      // A code-identical corpus vector may TIE the duplicate, but nothing
      // can beat the pointwise-minimum ADC the duplicate achieves.
      assert(dupAdc.contains(minAdc),
        s"query $q: duplicate adc $dupAdc is not the minimum $minAdc")
    }

    // Determinism: codes and ranking identical across repartitionings.
    val a = Knn.pqTopK(corpus.repartition(7), queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    val b = Knn.pqTopK(corpus.repartition(3), queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sorted.toSeq
    assert(a === b)
  }
}
