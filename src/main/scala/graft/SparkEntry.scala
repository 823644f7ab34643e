package graft

import graft.api.{QueryModule, QuerySpec}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryModule]]'s declared queries. Each entry is a
  * Spark implementation; `oracleSql` carries the DuckDB-equivalent SQL for
  * the driver's differential correctness gate.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    graft.operators.RelationalQueries,
    graft.operators.TimeWindows,
    graft.operators.Graph,
    graft.operators.Merge,
    graft.operators.Baskets,
    graft.operators.Finance,
    graft.operators.CountMin,
    graft.operators.KmvSketch,
    graft.operators.MvQueries,
    graft.operators.Geo,
    graft.pipeline.PipelineQueries,
    graft.llm.Dedup,
    graft.llm.CorpusDiagnostics,
    graft.llm.CurationOps,
    graft.llm.Knn,
    graft.llm.Retrieval,
    graft.llm.Embeddings,
    graft.llm.TextAnalysis,
    graft.llm.WebCuration,
    graft.llm.SftOps,
    graft.llm.Training,
    graft.llm.MultimodalQueries,
    graft.sources.SourceFormats)

  val specs: Map[String, QuerySpec] =
    modules.foldLeft(Map.empty[String, QuerySpec]) { (acc, m) =>
      val dup = acc.keySet.intersect(m.queries.keySet)
      require(dup.isEmpty, s"duplicate query names: $dup")
      acc ++ m.queries
    }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core computation end-to-end: raw feed → quality gate →
    * dedup → geo enrichment → declared gold aggregation. */
  def entry(spark: SparkSession): DataFrame =
    specs("pipe_gold").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.collect { case (k, QuerySpec(_, Some(sql), _, _)) => k -> sql }

  /** Headline benchmark subset (run by graft.Bench). */
  def benchQueries: Seq[String] =
    specs.collect { case (k, v) if v.bench => k }.toSeq.sorted
}
