package graft

import org.apache.spark.sql.functions._

/** Stratified sampling (content-addressed hash buckets): deterministic by
  * construction, a true subset, and per-stratum rates near the requested
  * fractions. */
class SamplingSpec extends SparkSpec {

  test("hash-bucket sampling is deterministic with correct strata behavior") {
    val a = SparkEntry.queries("llm_sample_stratified")(spark, sfDir)
    val b = SparkEntry.queries("llm_sample_stratified")(spark, sfDir)
    assert(a.except(b).isEmpty && b.except(a).isEmpty, "sampling not deterministic")

    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(a.join(src, "doc_id").count() === a.count(), "sample not a subset")

    val counts = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = src.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("zh"), "zero-fraction stratum leaked rows")
    assert(counts("fr") === totals("fr"), "fraction-1.0 stratum must keep all")
    val enRate = counts("en").toDouble / totals("en")
    assert(enRate > 0.3 && enRate < 0.7, s"en rate $enRate far from 0.5")
  }
}
