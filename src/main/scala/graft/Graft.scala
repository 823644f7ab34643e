package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library's front door.
  *
  * Everything the engine offers is reachable from here in three moves:
  *
  *   1. `Graft.session()` — a SparkSession with the engine's
  *      scale-oriented defaults (AQE, UTC, broadcast threshold, RocksDB
  *      streaming state) and the native Catalyst functions
  *      (`minhash_sig`, `md5_long`, `poly_fingerprint`, `vec_cosine`,
  *      `token_windows`, …) registered for both the DataFrame and SQL
  *      surfaces.
  *   2. `Graft.registerTables(spark, dir)` — the data directory's tables
  *      as temp views, opening the SQL door: `spark.sql("SELECT …")`.
  *   3. `Graft.query(spark, dir, name)` — any of the ~200 named,
  *      oracle-checked queries by name (`Graft.queryNames` lists them).
  *
  * Specialist surfaces live in their modules and take plain DataFrames:
  * `graft.llm.Dedup` (minhash/simhash/containment/passage near-dup,
  * clustering, keep-sets), `graft.llm.Knn` (exact/LSH/IVF vector search),
  * `graft.llm.TextAnalysis`, `graft.plans.AsofJoin` (native as-of join),
  * `graft.streaming.Medallion` (the streaming bronze/silver/gold
  * pipeline). See the README quick-start.
  */
object Graft {
  /** Session with the engine's defaults and native functions installed. */
  def session(appName: String = "graft"): SparkSession = GraftSession(appName)

  /** Load one table (`region … lineitem events documents embeddings`)
    * from a data directory as a plain DataFrame (pushdown-transparent). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(spark, dir, name)

  /** Register every table in `dir` as a temp view — the SQL door. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    sources.Tables.registerAll(spark, dir)

  /** All named queries, sorted. */
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Build a named query against the tables in `dir`. */
  def query(spark: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name' — see Graft.queryNames"))(spark, dir)
}
