package graft

import graft.operators.Finance
import graft.llm.CurationOps
import org.apache.spark.sql.functions._

/** Invariant checks for the financial time-series family and the
  * budget-constrained selection plan (the oracle gate checks exact values;
  * these pin the semantic shape on the smallest fixture). */
class FinanceSpec extends SparkSpec {

  private def run(name: String) = {
    val spec = SparkEntry.specs(name)
    spec.fn(spark, sfDir)
  }

  test("ts_ohlc: low <= open/close <= high, volume positive") {
    val bad = run("ts_ohlc").filter(
      col("low") > col("high") ||
        col("open") < col("low") || col("open") > col("high") ||
        col("close") < col("low") || col("close") > col("high") ||
        col("n") <= 0)
    assert(bad.isEmpty, "OHLC ordering violated")
  }

  test("ts_ohlc: single-event buckets have open == close == high == low") {
    val singles = run("ts_ohlc").filter(col("n") === 1)
    assert(singles.count() > 0, "fixture should contain 1-event buckets")
    val bad = singles.filter(
      col("open") =!= col("close") || col("high") =!= col("low") ||
        col("open") =!= col("high"))
    assert(bad.isEmpty)
  }

  test("ts_drawdown: drawdown is non-negative and zero for monotone paths") {
    val dd = run("ts_drawdown")
    assert(dd.filter(col("max_drawdown") < 0).isEmpty)
    // events.value >= 0 in the fixtures -> cumulative path is monotone
    // non-decreasing -> every drawdown must be exactly zero.
    val negVals = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("value") < 0).count()
    if (negVals == 0) assert(dd.filter(col("max_drawdown") > 0).isEmpty)
  }

  test("ts_twap: twap lies within the day's [min, max] value") {
    val events = graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bad = run("ts_twap").join(events, Seq("user_id", "day"))
      .filter(col("twap") < col("lo") - lit(1e-9) ||
        col("twap") > col("hi") + lit(1e-9))
    assert(bad.isEmpty, "TWAP outside the day's value envelope")
  }

  test("llm_select_budget: spends within budget and prefers denser buckets") {
    val sel = run("llm_select_budget").cache()
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val total = docs.agg(sum(col("n_tokens"))).head().getLong(0)
    val spent = sel.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(spent <= total / 4, s"spent $spent exceeds budget ${total / 4}")
    // Greedy threshold structure: every fully-selected bucket is denser
    // than (or equal to) the boundary bucket, which is denser than any
    // wholly-unselected bucket.
    val minFull = sel.filter(col("in_full")).agg(min(col("bucket")))
      .head().getLong(0)
    val boundary = sel.filter(!col("in_full")).select(col("bucket"))
      .distinct().collect().map(_.getLong(0))
    assert(boundary.length <= 1, "at most one boundary bucket")
    boundary.foreach(b => assert(b < minFull))
    sel.unpersist()
  }
}
