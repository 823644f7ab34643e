package graft.llm

import graft.api.{QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings.embedding`.
  *
  * Two plans for the same task:
  *   - `llm_knn_brute`: exact cosine top-k for a small query set against the
  *     full corpus. The query side is broadcast (it is small by
  *     construction), so the corpus streams through one pass with no
  *     shuffle-by-pair blowup; top-k per query is a window over the
  *     candidate rows. This is the correct 100 TB plan whenever
  *     |queries| × |corpus| work fits the cluster — and it is the
  *     recall-1.0 baseline the ANN path is measured against.
  *   - `llm_knn_lsh`: the scale path — seeded random-hyperplane LSH
  *     ([[VectorOps.lshCodes]]) bucket-joins queries to corpus candidates
  *     (shuffle on (table, code) — never all pairs), then scores exact
  *     cosine on candidates only. ANN retrieves *near* neighbors; the
  *     driver's embeddings are uniform noise (no near neighbors exist), so
  *     KnnSpec measures recall on a planted-neighbor corpus where the true
  *     top-k are genuinely close — the workload ANN exists for.
  *
  * The driver's fixtures are 64-dim; the expressions take dims as a
  * parameter where it matters.
  */
object Knn extends QueryModule {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .withColumn("ve", VectorOps.asDouble("embedding"))
      .select(col("vec_id"), col("ve"))

  /** Exact top-k for queries (vec_id < 20) over the full corpus. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("ve").as("vq")))
    val scored = corpus.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", VectorOps.cosine("vq", "ve"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** LSH candidates → exact cosine → top-k (rows bounded by bucket sizes). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    def coded(df: DataFrame, idAs: String, veAs: String) =
      VectorOps.lshCoded(df.select(col("vec_id"), col("ve")))
        .select(col("vec_id").as(idAs), col("ve").as(veAs), col("t"), col("code"))
    val cand = coded(queries, "query_id", "vq")
      .join(coded(corpus, "neighbor_id", "vn"), Seq("t", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "vq", "neighbor_id", "vn").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .withColumn("cosine", VectorOps.cosine("vq", "vn"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Corpus with 10 planted near neighbors per vector (dim i nudged by
    * +0.02, ids offset by i·10⁶) — gives ANN something real to retrieve. */
  def plantedCorpus(base: DataFrame): DataFrame =
    base.unionAll(
      base
        .select(col("vec_id"), col("ve"), explode(expr("sequence(1, 10)")).as("i"))
        .select(
          (col("vec_id") + col("i") * 1000000L).as("vec_id"),
          expr("transform(ve, (x, j) -> CASE WHEN j = i - 1 THEN x + 0.02 ELSE x END)")
            .as("ve")))

  def queries: Map[String, QuerySpec] = Map(
    // Exact brute-force cosine top-10, DuckDB-checked.
    "llm_knn_brute" -> QuerySpec(
      fn = (s, dir) => {
        val corpus = emb(s, dir)
        bruteTopK(corpus, corpus.filter(col("vec_id") < 20), k = 10)
      },
      oracle = Some("""
        WITH corpus AS (
          SELECT vec_id,
                 [CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 64)] AS ve
          FROM embeddings),
        scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 list_reduce(list_transform(generate_series(1, 64),
                     i -> q.ve[i] * c.ve[i]), (x, y) -> x + y)
                 / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                        i -> q.ve[i] * q.ve[i]), (x, y) -> x + y))
                    * sqrt(list_reduce(list_transform(generate_series(1, 64),
                        i -> c.ve[i] * c.ve[i]), (x, y) -> x + y))) AS cosine
          FROM corpus q JOIN corpus c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10"""),
      bench = true),

    // ANN top-10 on the planted-neighbor corpus (recall pinned by KnnSpec).
    // Differential-checked bit-for-bit: the MD5-Rademacher hyperplanes
    // ([[graft.functions.HyperplaneCodesMd5]]) are reconstructible in
    // DuckDB (`md5_number_upper` low bit → ±1, ordered list_reduce dot
    // products), so the oracle rebuilds the SAME buckets, candidates, and
    // ranking — not just a ground-truth approximation.
    "llm_knn_lsh" -> QuerySpec(
      fn = (s, dir) => {
        val base = emb(s, dir)
        lshTopK(plantedCorpus(base), base.filter(col("vec_id") < 20), k = 10)
      },
      oracle = Some("""
        WITH base AS (
          SELECT vec_id,
                 [CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 64)] AS ve
          FROM embeddings),
        planted AS (
          SELECT vec_id, ve FROM base
          UNION ALL
          SELECT vec_id + i * 1000000,
                 [CASE WHEN j = i THEN ve[j] + 0.02 ELSE ve[j] END
                  for j in generate_series(1, 64)]
          FROM base, generate_series(1, 10) g(i)),
        q AS (SELECT vec_id, ve FROM base WHERE vec_id < 20),
        w AS (
          SELECT t, j,
                 list(CASE WHEN md5_number_upper('hp:'||t||':'||j||':'||i) & 1 = 1
                           THEN 1.0 ELSE -1.0 END ORDER BY i) AS wv
          FROM generate_series(0, 3) gt(t), generate_series(0, 15) gj(j),
               generate_series(0, 63) gi(i)
          GROUP BY t, j),
        ccodes AS (
          SELECT vec_id, t,
                 CAST(SUM(CASE WHEN dot >= 0 THEN (1 << (15 - j)) ELSE 0 END) AS INT)
                   AS code
          FROM (SELECT p.vec_id, w.t, w.j,
                       list_reduce(list_transform(generate_series(1, 64),
                           i -> p.ve[i] * w.wv[i]), (a, b) -> a + b) AS dot
                FROM planted p, w)
          GROUP BY vec_id, t),
        qcodes AS (
          SELECT vec_id, t,
                 CAST(SUM(CASE WHEN dot >= 0 THEN (1 << (15 - j)) ELSE 0 END) AS INT)
                   AS code
          FROM (SELECT q.vec_id, w.t, w.j,
                       list_reduce(list_transform(generate_series(1, 64),
                           i -> q.ve[i] * w.wv[i]), (a, b) -> a + b) AS dot
                FROM q, w)
          GROUP BY vec_id, t),
        cand AS (
          SELECT DISTINCT qc.vec_id AS query_id, cc.vec_id AS neighbor_id
          FROM qcodes qc JOIN ccodes cc ON qc.t = cc.t AND qc.code = cc.code
          WHERE qc.vec_id <> cc.vec_id),
        scored AS (
          SELECT cand.query_id, cand.neighbor_id,
                 list_reduce(list_transform(generate_series(1, 64),
                     i -> q.ve[i] * p.ve[i]), (x, y) -> x + y)
                 / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                        i -> q.ve[i] * q.ve[i]), (x, y) -> x + y))
                    * sqrt(list_reduce(list_transform(generate_series(1, 64),
                        i -> p.ve[i] * p.ve[i]), (x, y) -> x + y))) AS cosine
          FROM cand
          JOIN q ON q.vec_id = cand.query_id
          JOIN planted p ON p.vec_id = cand.neighbor_id),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 10""")))
}
