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

  test("ts_ohlc_gaps is consistent with the candles it derives from") {
    val candles = run("ts_ohlc")
      .select(col("event_type"), col("bucket"), col("open"), col("close"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getDouble(2), r.getDouble(3))))
      .toMap
    val byType = candles.keys.groupBy(_._1).map { case (t, ks) =>
      t -> ks.map(_._2).toSeq.sorted
    }
    val gaps = run("ts_ohlc_gaps").collect()
    assert(gaps.nonEmpty)
    gaps.foreach { r =>
      val (t, b) = (r.getString(0), r.getString(1))
      val buckets = byType(t)
      val prevBucket = buckets(buckets.indexOf(b) - 1)
      val expectedPrevClose = candles((t, prevBucket))._2
      assert(r.getDouble(3) === expectedPrevClose,
        s"($t,$b) prev_close mismatch vs the preceding candle")
      assert(r.getDouble(4) === r.getDouble(2) - r.getDouble(3), "gap arithmetic")
      val dir = r.getString(6)
      val gap = r.getDouble(4)
      assert((gap > 0 && dir == "up") || (gap < 0 && dir == "down") ||
        (gap == 0 && dir == "flat"), s"direction $dir for gap $gap")
    }
  }

  test("ts_var_cvar: tail mean never exceeds the tail boundary, k = ceil(0.05 n)") {
    val bad = run("ts_var_cvar").filter(
      col("cvar_5") > col("var_5") + lit(1e-9) ||
        col("k") =!= ceil(lit(0.05) * col("n")) ||
        col("k") < 1 || col("k") > col("n"))
    assert(bad.isEmpty, "VaR/CVaR tail structure violated")
  }

  test("ts_ohlc expressions run unchanged under readStream + watermark") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val agg = mem.toDF().toDF("ts", "event_id", "event_type", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        min_by($"value", struct($"ts", $"event_id")).as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", struct($"ts", $"event_id")).as("close"),
        count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (t("2024-01-01 09:05:00"), 1L, "buy", 10.0),
        (t("2024-01-01 09:20:00"), 2L, "buy", 30.0),
        (t("2024-01-01 09:40:00"), 3L, "buy", 5.0),
        (t("2024-01-01 09:55:00"), 4L, "buy", 20.0))
      q.processAllAvailable()
      // Watermark past 10:30 -> the 09:00 candle finalizes.
      mem.addData((t("2024-01-01 11:30:00"), 5L, "buy", 1.0))
      q.processAllAvailable()
      val out = spark.table("ohlc_out")
        .select(date_format($"window.start", "HH:mm").as("w"),
          $"open", $"high", $"low", $"close", $"n")
        .as[(String, Double, Double, Double, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      assert(out("09:00") === ((10.0, 30.0, 5.0, 20.0, 4L)),
        "streaming candle disagrees with the batch OHLC semantics")
      assert(!out.contains("11:00"), "open candle emitted before watermark")
    } finally q.stop()
  }

  test("llm_select_budget equals naive global greedy (prefix-stop) exactly") {
    // The two-phase threshold plan claims to be a pure rewrite of greedy
    // selection by density — prove it against the textbook spelling:
    // order ALL docs by (density desc, doc_id), admit while the running
    // token total fits the budget, stop at the first overflow.
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val budget = docs.map(_._3).sum / 4
    // Mirror the query's quantization tie-order: (bucket desc, ratio
    // desc, doc_id). Bucket is monotone in ratio, so this is the same
    // order as (ratio desc, doc_id) except among equal ratios — where
    // both orders agree on doc_id.
    val ordered = docs.sortBy { case (id, chars, toks) =>
      (-(chars.toDouble / toks), id)
    }
    // Strict-prefix greedy: admit while it fits, stop COMPLETELY at the
    // first doc that does not (the plan's boundary-bucket cumsum filter
    // is a monotone prefix, and nothing below the boundary bucket is
    // ever admitted).
    var spent = 0L
    var stopped = false
    val expected = scala.collection.mutable.LinkedHashSet[Long]()
    for ((id, _, toks) <- ordered if !stopped) {
      if (spent + toks <= budget) { spent += toks; expected += id }
      else stopped = true
    }
    val got = run("llm_select_budget").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got === expected.toSet,
      s"two-phase plan diverged from greedy: only-plan=${(got -- expected).take(5)} " +
        s"only-greedy=${(expected.toSet -- got).take(5)}")
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
    val minFullRow = sel.filter(col("in_full")).agg(min(col("bucket"))).head()
    val boundary = sel.filter(!col("in_full")).select(col("bucket"))
      .distinct().collect().map(_.getLong(0))
    assert(boundary.length <= 1, "at most one boundary bucket")
    // With no fully-selected bucket (densest bucket alone exceeds the
    // budget) the ordering property is vacuous — but say so rather than
    // NPE on the null min.
    if (minFullRow.isNullAt(0))
      assert(boundary.length <= 1, "no full bucket: only the boundary may select")
    else boundary.foreach(b => assert(b < minFullRow.getLong(0)))
    sel.unpersist()
  }

  test("halo-chunked RSI is bit-identical to the global window at every chunking") {
    val s = spark
    val ev = graft.sources.Tables.load(s, sfDir, "events")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(",")).toSeq
    val global = canon(SparkEntry.queries("ts_rsi")(s, sfDir))
    // Two different chunk granularities, both with every non-first chunk
    // >= 14 rows on this fixture — concatenated chunk outputs must equal
    // the global window EXACTLY (same DECIMAL sums, same doubles).
    for (chunk <- Seq(date_trunc("month", col("ts")),
                      date_trunc("week", col("ts")))) {
      val chunked = canon(Finance.rsiChunked(ev, chunk))
      assert(chunked === global,
        s"chunked RSI diverged from the global window for chunk=$chunk")
    }
    // The correctness precondition is CHECKED, not assumed: day-chunking
    // this small fixture leaves non-first chunks under the 14-row halo
    // and must fail loudly — with the DEDICATED retryable type, so the
    // registry's day→month fallback cannot swallow unrelated IAEs.
    val e = intercept[graft.operators.HaloChunk.HaloTooSmallException](
      Finance.rsiChunked(ev, date_trunc("day", col("ts"))))
    assert(e.getMessage.contains("halo"))
  }

  test("halo-chunked stochastic is bit-identical to the global window at every chunking") {
    val s = spark
    val ev = graft.sources.Tables.load(s, sfDir, "events")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString(",")).toSeq
    val global = canon(SparkEntry.queries("ts_stochastic")(s, sfDir))
    for (chunk <- Seq(date_trunc("month", col("ts")),
                      date_trunc("week", col("ts")))) {
      val chunked = canon(Finance.stochasticChunked(ev, chunk))
      assert(chunked === global,
        s"chunked stochastic diverged from the global window for chunk=$chunk")
    }
  }

  test("non-monotone chunk expression is rejected loudly, not retried") {
    val s = spark
    val ev = graft.sources.Tables.load(s, sfDir, "events")
    // hour(ts) repeats across days: chunk order != time order, so the
    // halo rows would not sort before the next chunk's home rows. This
    // must throw a PLAIN IllegalArgumentException naming the problem —
    // NOT HaloTooSmallException (a coarser chunking cannot fix it, so the
    // registry's fallback must not catch it).
    val e = intercept[IllegalArgumentException](
      Finance.rsiChunked(ev, hour(col("ts"))))
    assert(!e.isInstanceOf[graft.operators.HaloChunk.HaloTooSmallException])
    assert(e.getMessage.contains("monotone"))
  }
}
