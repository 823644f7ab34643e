package graft

import graft.pipeline.{ActivityPipeline, IpRegionDim}
import org.apache.spark.sql.functions._

/** The three escalating implementations of IP→region enrichment from the
  * survey (§2.9 U1) must agree: broadcast dimension join (the engine's
  * choice — optimizer-transparent), a pure-Catalyst typedlit map lookup,
  * and a Scala UDF (API-parity demonstration only; it blocks pushdown and
  * codegen, which is why the engine does not use it). */
class EnrichmentEquivalenceSpec extends SparkSpec {

  test("broadcast join == typedlit map == scala udf") {
    val s = spark
    import s.implicits._

    val base = graft.pipeline.PipelineQueries.rawActivity(spark, sfDir)
      .select(col("ip_address")).distinct()

    // 1. Engine path: broadcast dimension join.
    val viaJoin = ActivityPipeline.enrich(
      ActivityPipeline.bronzeValid(ActivityPipeline.parseRaw(
        graft.pipeline.PipelineQueries.rawActivity(spark, sfDir))))
      .select("ip_address", "geo_region").distinct()

    // 2. Pure-Catalyst map literal lookup.
    val m = typedlit(IpRegionDim.entries.toMap)
    val viaMap = base.select(col("ip_address"),
      coalesce(element_at(m, col("ip_address")), lit("Unknown")).as("geo_region"))

    // 3. Scala UDF (the reference's shape, 00_utils.py:55-57).
    val lookup = IpRegionDim.entries.toMap
    val ipUdf = udf((ip: String) => lookup.getOrElse(ip, "Unknown"))
    val viaUdf = base.select(col("ip_address"), ipUdf(col("ip_address")).as("geo_region"))

    assert(viaJoin.except(viaMap).isEmpty && viaMap.except(viaJoin).isEmpty)
    assert(viaMap.except(viaUdf).isEmpty && viaUdf.except(viaMap).isEmpty)
  }
}
