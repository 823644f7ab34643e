package graft.llm

import graft.api.{Exact, QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

/** In-engine model training: a Rocchio (nearest-centroid) text classifier
  * trained and evaluated entirely inside the engine — the workhorse
  * "cheap learned router" of production data pipelines (label a slice,
  * average its term vectors, assign everything by nearest centroid).
  *
  * Mechanics, all exact and 100 TB-shaped:
  *   - features: 256 hashed bag-of-token buckets per document
  *     (`md5_long(tok) & 255` counts — the DSIR hashing trick), built in
  *     one codegen HOF pass, no shuffle;
  *   - training = per-class centroids: exact-DECIMAL dimension means
  *     (order-independent at any parallelism), one aggregate over
  *     (class, dim) — |classes|·dims rows total;
  *   - inference: the centroid set packs into ONE broadcast row; each
  *     document scores |classes| ordered-fold cosines and takes the
  *     argmax via an array fold (tie-break: lexicographically smallest
  *     class) — a genuinely shuffle-free pass over the corpus (no
  *     explode, no per-doc window);
  *   - evaluation: the (actual, predicted) confusion matrix, a
  *     |classes|² hash aggregate.
  *
  * Every number is either an exact integer/decimal or an IEEE expression
  * spelled identically in the DuckDB oracle, so train → classify →
  * evaluate is differential-checked END-TO-END — a trained model whose
  * entire lifecycle hash-matches a second engine.
  *
  * Honest fixture note: the synthetic corpus carries NO text↔lang signal
  * (the lang column is assigned independently of the token stream —
  * verified: zero documents contain their language's marker stopwords),
  * so fixture accuracy is chance-level BY CONSTRUCTION; the oracle checks
  * the exact training/inference semantics, and `TrainingSpec` proves the
  * classifier actually learns (100% on a constructed separable corpus).
  */
object Training extends QueryModule {

  val dims = 256

  /** (doc_id, label, f: 256 hashed token-bucket counts as double). */
  def features(docsDf: DataFrame, labelCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    docsDf
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("toksh", expr(s"transform(toks, t -> md5_long(t) & ${dims - 1})"))
      .select(
        col("doc_id"),
        col(labelCol).as("label"),
        expr(
          s"""transform(sequence(0, ${dims - 1}),
                i -> CAST(size(filter(toksh, h -> h = i)) AS DOUBLE))""").as("f"))
  }

  /** Per-class centroids: exact-decimal dimension means, assembled into
    * one vector row per class. */
  def centroids(feats: DataFrame): DataFrame =
    feats
      .select(col("label"), posexplode(col("f")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(Exact.davg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(i, m))), s -> s.m)")
        .as("c"))

  /** Nearest-centroid assignment (cosine argmax, smallest-class
    * tie-break): adds `predicted` to each feature row. The centroid set
    * is packed into ONE broadcast row and the argmax runs as an array
    * fold per document — no explode, no per-doc window, zero shuffle on
    * the corpus side (a window spelling would shuffle corpus×classes
    * rows on doc_id; at 100 TB that is 5× the data moved for nothing). */
  def classify(feats: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(feats.sparkSession)
    val packed = cents.agg(expr(
      "sort_array(collect_list(struct(label AS clabel, c)))").as("cs"))
    feats
      .crossJoin(broadcast(packed))
      .withColumn("best", expr(
        """array_sort(
             transform(cs, s -> struct(vec_cosine(f, s.c) AS cosine,
                                       s.clabel AS clabel)),
             (a, b) -> CASE WHEN a.cosine > b.cosine THEN -1
                            WHEN a.cosine < b.cosine THEN 1
                            WHEN a.clabel < b.clabel THEN -1
                            WHEN a.clabel > b.clabel THEN 1
                            ELSE 0 END)[0]"""))
      .select(col("doc_id"), col("label"), col("best.clabel").as("predicted"),
        col("best.cosine").as("cosine"))
  }

  /** Train on the full corpus and report the confusion matrix. */
  def confusion(docsDf: DataFrame, labelCol: String): DataFrame = {
    val feats = features(docsDf, labelCol)
    classify(feats, centroids(feats))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  // ---------------------------------------------------------------- oracle

  /** Oracle-side cosine identical to [[graft.functions.VecCosine]] (ordered
    * left-to-right list_reduce; zero vectors score 0.0) — the same spelling
    * the Knn/Retrieval oracles use, at $dims dimensions. */
  private def cosSql(a: String, b: String): String = {
    def norm2(v: String) =
      s"""list_reduce(list_transform(generate_series(1, $dims),
            i -> $v[i] * $v[i]), (x, y) -> x + y)"""
    s"""
    CASE WHEN ${norm2(a)} = 0 OR ${norm2(b)} = 0 THEN 0.0
         ELSE list_reduce(list_transform(generate_series(1, $dims),
                i -> $a[i] * $b[i]), (x, y) -> x + y)
              / (sqrt(${norm2(a)}) * sqrt(${norm2(b)})) END"""
  }

  def queries: Map[String, QuerySpec] = Map(
    // ------------------------------------------------------------------
    // Rocchio classifier lifecycle: train centroids on the lang labels,
    // classify the corpus, emit the confusion matrix.
    "llm_train_centroid" -> QuerySpec(
      fn = (s, dir) => confusion(Tables.load(s, dir, "documents"), "lang"),
      oracle = Some(s"""
        WITH feats AS (
          SELECT doc_id, lang AS label,
                 [CAST(len(list_filter(toksh, h -> h = i)) AS DOUBLE)
                  for i in generate_series(0, ${dims - 1})] AS f
          FROM (SELECT doc_id, lang,
                       list_transform(string_split_regex(lower(text), '\\s+'),
                                      t -> md5_number_upper(t) & ${dims - 1})
                         AS toksh
                FROM documents)),
        dimsums AS (
          SELECT label, i,
                 CAST(SUM(CAST(f[i] AS DECIMAL(30,6))) AS DOUBLE) / COUNT(f[i])
                   AS m
          FROM feats, generate_series(1, $dims) s(i)
          GROUP BY label, i),
        cents AS (
          SELECT label AS clabel, list(m ORDER BY i) AS c
          FROM dimsums GROUP BY label),
        scored AS (
          SELECT f.doc_id, f.label, c.clabel, ${cosSql("f.f", "c.c")} AS cosine
          FROM feats f CROSS JOIN cents c),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY cosine DESC, clabel) AS rn
          FROM scored)
        SELECT label, clabel AS predicted, COUNT(*) AS n
        FROM ranked WHERE rn = 1
        GROUP BY label, clabel""")))
}
