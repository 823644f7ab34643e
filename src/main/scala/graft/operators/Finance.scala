package graft.operators

import graft.api.{Exact, QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Financial time-series operators over `events` (SURVEY §2.8 extension —
  * the reference aggregates watch-time only, but an analytics engine for a
  * wealth-management data platform needs the candlestick/returns family):
  *
  *   - `ts_ohlc`: per (event_type, hour) candlestick — open/high/low/close
  *     plus volume. Unlike `ts_downsample_m4` (four full ranking windows,
  *     one per extreme), this is ONE hash aggregate: open/close come from
  *     `min_by`/`max_by` keyed on the total order (ts, event_id), which
  *     partial-aggregates map-side like any min/max. At 100 TB that is a
  *     single shuffle of ~types×hours groups, no window sort of raw rows.
  *   - `ts_drawdown`: maximum drawdown per user over the cumulative value
  *     path — running peak minus running sum, maximized. The cumulative
  *     path accumulates in exact DECIMAL (the [[Exact]] contract), so the
  *     running max and the final drawdown are bit-identical across
  *     partitionings and engines. One window sorted by the per-user total
  *     order; state is O(1) per row.
  *   - `ts_twap`: time-weighted average value per (user, day) — each
  *     observation weighted by its holding interval (time until the next
  *     observation that day; the day's last observation carries no
  *     interval). Weights are exact integer microseconds, products
  *     accumulate in DECIMAL, and the single final division runs in
  *     double on both engines. One lead window + one hash aggregate.
  *
  * All three shuffle once on their grouping key and carry no driver-side
  * state; the windows partition by user (or user-day), so no single task
  * ever sees more than one key's history.
  */
object Finance extends QueryModule {

  import Exact.dsum

  /** RSI-14 over a coarse series, parallelized by time-chunks with a
    * 14-row halo via [[HaloChunk]] — the implemented form of the scale
    * path the `ts_rsi` doc promises. Every frame in the RSI plan is
    * bounded (lag(1) + a 14-row SMA window), so a row's output depends on
    * at most its 14 predecessors; the chunk concatenation is EXACTLY the
    * global window's output (spec-pinned bit-identical, sums in the same
    * exact DECIMAL). Preconditions — interior chunks ≥ 14 rows, chunk
    * order = time order — are checked loudly by [[HaloChunk.prepare]];
    * the `rn >= 15` warm-up gate (only rows with a full 14-delta history
    * emit) rides the reconstructed global row number. */
  def rsiChunked(
      events: org.apache.spark.sql.DataFrame,
      chunkExpr: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val ch = HaloChunk.prepare(events
      .select(col("event_type"), col("event_id"), col("ts"), col("value")),
      Seq("event_type"), chunkExpr, halo = 14)
    val w = ch.w
    val f14 = w.rowsBetween(-13, 0)
    val dec = org.apache.spark.sql.types.DecimalType(30, 6)
    val zero = lit(0).cast(dec)
    HaloChunk.finish(
      ch.df
        .withColumn("delta",
          col("value").cast(dec) - lag(col("value"), 1).over(w).cast(dec))
        .withColumn("gsum",
          sum(when(col("delta") > 0, col("delta")).otherwise(zero)).over(f14))
        .withColumn("lsum",
          sum(when(col("delta") < 0, -col("delta")).otherwise(zero)).over(f14)),
      minGlobalRn = 15)
      .select(col("event_type"), col("event_id"),
        when(col("lsum") === 0, lit(100.0))
          .otherwise(lit(100.0) - lit(100.0) /
            (lit(1.0) + col("gsum").cast("double") / col("lsum").cast("double")))
          .as("rsi"))
  }

  /** Stochastic %K/%D-14 chunked by the same halo recipe. The deepest
    * dependency is 15 rows: %D lags %K by up to 2, and each %K looks 13
    * rows back for its low/high envelope — so halo = 15 and the warm-up
    * gate is `rn >= 16`, matching `ts_stochastic`'s global plan exactly.
    * All arithmetic is the global spelling verbatim (rolling MIN/MAX are
    * exact on doubles; %D is the pinned 3-term lag average), so chunk
    * outputs concatenate bit-identically. */
  def stochasticChunked(
      events: org.apache.spark.sql.DataFrame,
      chunkExpr: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val ch = HaloChunk.prepare(events
      .select(col("event_type"), col("event_id"), col("ts"), col("value")),
      Seq("event_type"), chunkExpr, halo = 15)
    val w = ch.w
    val f14 = w.rowsBetween(-13, 0)
    HaloChunk.finish(
      ch.df
        .withColumn("lo", min(col("value")).over(f14))
        .withColumn("hi", max(col("value")).over(f14))
        .withColumn("k",
          when(col("hi") === col("lo"), lit(50.0))
            .otherwise((col("value") - col("lo")) / (col("hi") - col("lo")) * lit(100.0)))
        .withColumn("d",
          (col("k") + lag(col("k"), 1).over(w) + lag(col("k"), 2).over(w)) / lit(3.0)),
      minGlobalRn = 16)
      .select(col("event_type"), col("event_id"), col("k"), col("d"))
  }

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** The per-(type, hour) candlestick grid — ONE partial-aggregable hash
    * aggregate with open/close as `min_by`/`max_by` under the (ts,
    * event_id) total order. Shared by `ts_ohlc` (the candles) and
    * `ts_ohlc_gaps` (the gap signal over them). */
  private def ohlcGrid(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "events")
      .withColumn("bucket", date_trunc("hour", $"ts"))
      .groupBy($"event_type", $"bucket")
      .agg(
        min_by($"value", struct($"ts", $"event_id")).as("open"),
        max($"value").as("high"),
        min($"value").as("low"),
        max_by($"value", struct($"ts", $"event_id")).as("close"),
        count(lit(1)).as("n"),
        dsum($"value").as("vsum"))
  }

  def queries: Map[String, QuerySpec] = Map(

    // ------------------------------------------------------------------
    // Candlestick resample: one aggregate, arg-extremes under the total
    // order (ts, event_id) so ties cannot flip open/close between engines.
    "ts_ohlc" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        ohlcGrid(s, dir)
          .select($"event_type", date_format($"bucket", fmt).as("bucket"),
            $"open", $"high", $"low", $"close", $"n", $"vsum")
      },
      oracle = Some(s"""
        WITH b AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, value,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events)
        SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high, MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n,
               ${Exact.sqlSum("value")} AS vsum
        FROM b GROUP BY event_type, bucket""")),

    // ------------------------------------------------------------------
    // Maximum drawdown per user: dd_t = max_{s<=t}(cum_s) - cum_t over the
    // exact-decimal cumulative path; report the worst dd and where the
    // path peaked. Decimal all the way down — no float path dependence.
    "ts_drawdown" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.load(s, dir, "events")
          .withColumn("cum",
            sum($"value".cast(DecimalType(30, 6))).over(w))
          .withColumn("peak", max($"cum").over(w))
          .groupBy($"user_id")
          .agg(
            max(($"peak" - $"cum")).cast("double").as("max_drawdown"),
            max($"peak").cast("double").as("peak_value"),
            count(lit(1)).as("n_events"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT user_id, ts, event_id,
                 SUM(CAST(value AS DECIMAL(30,6))) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM events),
        path AS (
          SELECT user_id, cum,
                 MAX(cum) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
          FROM c)
        SELECT user_id,
               CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown,
               CAST(MAX(peak) AS DOUBLE) AS peak_value,
               COUNT(*) AS n_events
        FROM path GROUP BY user_id""")),

    // ------------------------------------------------------------------
    // Candlestick gap analysis over the OHLC grid (shared ohlcGrid — the
    // open-vs-previous-close discontinuity that signals regime breaks
    // between bars): one lag window over the ~types×hours grid, never
    // raw events; gap arithmetic is plain double subtraction of two
    // already-exact candle fields, and the relative gap guards a zero
    // previous close instead of emitting Inf.
    "ts_ohlc_gaps" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"event_type").orderBy($"bucket")
        ohlcGrid(s, dir)
          .withColumn("prev_close", lag($"close", 1).over(w))
          .filter($"prev_close".isNotNull)
          .select($"event_type", date_format($"bucket", fmt).as("bucket"),
            $"open", $"prev_close",
            ($"open" - $"prev_close").as("gap"),
            when($"prev_close" =!= 0.0,
              ($"open" - $"prev_close") / $"prev_close").as("gap_pct"),
            when($"open" > $"prev_close", lit("up"))
              .when($"open" < $"prev_close", lit("down"))
              .otherwise(lit("flat")).as("direction"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, value,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events),
        c AS (
          SELECT event_type, bucket,
                 MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
                 MAX(CASE WHEN rn_d = 1 THEN value END) AS close
          FROM b GROUP BY event_type, bucket),
        g AS (
          SELECT event_type, bucket, open,
                 lag(close, 1) OVER (PARTITION BY event_type ORDER BY bucket)
                   AS prev_close
          FROM c)
        SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               open, prev_close,
               open - prev_close AS gap,
               CASE WHEN prev_close <> 0
                    THEN (open - prev_close) / prev_close END AS gap_pct,
               CASE WHEN open > prev_close THEN 'up'
                    WHEN open < prev_close THEN 'down'
                    ELSE 'flat' END AS direction
        FROM g WHERE prev_close IS NOT NULL""")),

    // ------------------------------------------------------------------
    // Candlestick pattern flags over the shared grid — the standard
    // shape taxonomy (doji: body ≲ range; hammer: long lower shadow,
    // short upper — a positive lower shadow is required, so flat
    // degenerate bars (open = high = low = close) cannot flag; engulfing:
    // current body swallows the previous bar's opposite-signed body).
    // All flags are pure double comparisons of
    // already-exact candle fields (no division — the doji test is spelled
    // body·10 ≤ range so a zero range needs no guard), plus one lag
    // window over the bounded grid for the engulfing pair.
    "ts_candle_patterns" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"event_type").orderBy($"bucket")
        ohlcGrid(s, dir)
          .withColumn("body", abs($"close" - $"open"))
          .withColumn("range", $"high" - $"low")
          .withColumn("upper", $"high" - greatest($"open", $"close"))
          .withColumn("lower", least($"open", $"close") - $"low")
          .withColumn("prev_open", lag($"open", 1).over(w))
          .withColumn("prev_close", lag($"close", 1).over(w))
          .select($"event_type", date_format($"bucket", fmt).as("bucket"),
            $"body", $"range",
            ($"body" * 10.0 <= $"range").as("doji"),
            ($"lower" > 0.0 && $"lower" >= $"body" * 2.0 &&
              $"upper" <= $"body").as("hammer"),
            coalesce($"prev_close" < $"prev_open" && $"close" > $"open" &&
              $"open" <= $"prev_close" && $"close" >= $"prev_open",
              lit(false)).as("bull_engulf"),
            coalesce($"prev_close" > $"prev_open" && $"close" < $"open" &&
              $"open" >= $"prev_close" && $"close" <= $"prev_open",
              lit(false)).as("bear_engulf"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket, value,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM events),
        c AS (
          SELECT event_type, bucket,
                 MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
                 MAX(value) AS high, MIN(value) AS low,
                 MAX(CASE WHEN rn_d = 1 THEN value END) AS close
          FROM b GROUP BY event_type, bucket),
        f AS (
          SELECT event_type, bucket, open, high, low, close,
                 abs(close - open) AS body, high - low AS range,
                 high - greatest(open, close) AS upper,
                 least(open, close) - low AS lower,
                 lag(open, 1) OVER w AS prev_open,
                 lag(close, 1) OVER w AS prev_close
          FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               body, range,
               body * 10.0 <= range AS doji,
               lower > 0.0 AND lower >= body * 2.0 AND upper <= body AS hammer,
               COALESCE(prev_close < prev_open AND close > open
                        AND open <= prev_close AND close >= prev_open,
                        FALSE) AS bull_engulf,
               COALESCE(prev_close > prev_open AND close < open
                        AND open >= prev_close AND close <= prev_open,
                        FALSE) AS bear_engulf
        FROM f""")),

    // ------------------------------------------------------------------
    // Rolling beta of each event type against the "market" (all types
    // combined): the regression slope β = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)
    // over a 24-observed-hour window, from INTEGER moments (the
    // ts_rolling_corr contract) so every engine-side sum is exact and the
    // single closing division is the only double. The market series is
    // the hourly grid re-aggregated (hours are bounded by calendar time,
    // not data volume — broadcastable at any scale) and joined back; the
    // rolling window runs per type over the ~types×hours grid, never over
    // raw events.
    "ts_rolling_beta" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val grid = Tables.load(s, dir, "events")
          .groupBy($"event_type", date_trunc("hour", $"ts").as("bucket"))
          .agg(count(lit(1)).as("y"))
        val market = grid.groupBy($"bucket").agg(sum($"y").as("x"))
        val w = Window.partitionBy($"event_type").orderBy($"bucket")
          .rowsBetween(-23, 0)
        // Moments accumulate in DECIMAL(38,0), not LongType: the market
        // count x is corpus-wide per hour, so at extreme scale x·y and
        // n·Σxy would clear 2⁶³ while the DuckDB oracle keeps computing in
        // 128-bit HUGEINT — decimal keeps both sides exact (headroom 10³⁸,
        // comparable to HUGEINT) instead of diverging at the ceiling.
        val (xd, yd) = ($"x".cast(DecimalType(38, 0)), $"y".cast(DecimalType(38, 0)))
        val (n, sx, sy, sxy, sxx) = (
          count(lit(1)).over(w), sum(xd).over(w), sum(yd).over(w),
          sum(xd * yd).over(w), sum(xd * xd).over(w))
        grid.join(broadcast(market), "bucket")
          .select($"event_type", date_format($"bucket", fmt).as("bucket"),
            $"y", $"x", n.as("n"), sx.as("sx"), sy.as("sy"),
            sxy.as("sxy"), sxx.as("sxx"))
          .select($"event_type", $"bucket", $"y", $"x",
            when(($"n" * $"sxx" - $"sx" * $"sx") > 0,
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
                ($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
              .as("beta"))
      },
      oracle = Some("""
        WITH grid AS (
          SELECT event_type, date_trunc('hour', ts) AS bucket,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2),
        market AS (
          SELECT bucket, SUM(y) AS x FROM grid GROUP BY bucket),
        m AS (
          SELECT event_type, bucket, y, x,
                 COUNT(*)   OVER wr AS n,
                 SUM(x)     OVER wr AS sx,
                 SUM(y)     OVER wr AS sy,
                 SUM(x * y) OVER wr AS sxy,
                 SUM(x * x) OVER wr AS sxx
          FROM grid JOIN market USING (bucket)
          WINDOW wr AS (PARTITION BY event_type ORDER BY bucket
                        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        SELECT event_type, strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
               CAST(y AS BIGINT) AS y, CAST(x AS BIGINT) AS x,
               CASE WHEN (n * sxx - sx * sx) > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                    END AS beta
        FROM m""")),

    // ------------------------------------------------------------------
    // Empirical daily VaR/CVaR at the 5% tail per (event_type, day): the
    // k = ceil(0.05·n) smallest observations define the tail; VaR is the
    // k-th smallest (max of the kept set — no interpolation ambiguity
    // between engines), CVaR the exact-decimal tail mean. Partitioning by
    // (type, day) bounds every window sort by one day's volume per type —
    // the partition key carries the scale argument, not the sort. Ties
    // break on event_id, so k-selection is identical everywhere.
    "ts_var_cvar" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"event_type", $"day")
          .orderBy($"value", $"event_id")
        val wn = Window.partitionBy($"event_type", $"day")
        Tables.load(s, dir, "events")
          .withColumn("day", to_date($"ts"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(wn))
          .filter($"rn" <= ceil(lit(0.05) * $"n"))
          .groupBy($"event_type", $"day")
          .agg(max($"n").as("n"), count(lit(1)).as("k"),
            max($"value").as("var_5"), Exact.davg($"value").as("cvar_5"))
          .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
            $"n", $"k", $"var_5", $"cvar_5")
      },
      oracle = Some(s"""
        WITH r AS (
          SELECT event_type, CAST(ts AS DATE) AS day, value,
                 row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY value, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS n
          FROM events)
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               MAX(n) AS n, COUNT(*) AS k, MAX(value) AS var_5,
               ${Exact.sqlAvg("value")} AS cvar_5
        FROM r WHERE rn <= CEIL(0.05 * n)
        GROUP BY event_type, day""")),

    // ------------------------------------------------------------------
    // Time-weighted average per (user, day): integer-microsecond holding
    // intervals from a lead window, decimal-exact weighted sum, one double
    // division at the end. Days with a single observation (no interval)
    // drop out via the HAVING guard rather than emitting NaN.
    "ts_twap" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id", $"day").orderBy($"ts", $"event_id")
        Tables.load(s, dir, "events")
          .withColumn("day", to_date($"ts"))
          .withColumn("dt_us", unix_micros(lead($"ts", 1).over(w)) - unix_micros($"ts"))
          .filter($"dt_us".isNotNull)
          .groupBy($"user_id", $"day")
          .agg(
            sum($"value".cast(DecimalType(30, 6)) * $"dt_us").as("wsum"),
            sum($"dt_us").as("tsum"),
            count(lit(1)).as("n_intervals"))
          .filter($"tsum" > 0)
          .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
            ($"wsum".cast("double") / $"tsum".cast("double")).as("twap"),
            $"n_intervals")
      },
      oracle = Some("""
        WITH iv AS (
          SELECT user_id, CAST(ts AS DATE) AS day, value,
                 epoch_us(lead(ts, 1) OVER (PARTITION BY user_id, CAST(ts AS DATE)
                   ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
          FROM events)
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               CAST(SUM(CAST(value AS DECIMAL(30,6)) * dt_us) AS DOUBLE)
                 / CAST(SUM(dt_us) AS DOUBLE) AS twap,
               COUNT(*) AS n_intervals
        FROM iv WHERE dt_us IS NOT NULL
        GROUP BY user_id, day HAVING SUM(dt_us) > 0""")),

    // ------------------------------------------------------------------
    // RSI-14 (Cutler's form — SMA of gains/losses, not Wilder's recursive
    // EMA, precisely because an SMA is ONE rows-frame window: no
    // order-sensitive recursion to replay). Deltas and the 14-row
    // gain/loss sums accumulate in exact DECIMAL (the [[Exact]] contract),
    // so the sums are bit-identical across partitionings and engines; the
    // single 100 − 100/(1 + g/l) step runs in double with the zero-loss
    // branch pinned to 100 on both sides (Spark's double x/0 is Inf,
    // DuckDB's is NULL — the CASE keeps that divergence out of the plan).
    // One window sort per event_type partition, O(1) state per row. The
    // per-type partition is coarse; at 100 TB a single series parallelizes
    // by time-range chunks with a 13-row halo per boundary (every frame
    // here is bounded at 14 rows, so chunk outputs concatenate exactly) —
    // the same recipe applies to ts_stochastic below.
    "ts_rsi" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
        val f14 = w.rowsBetween(-13, 0)
        val zero = lit(0).cast(DecimalType(30, 6))
        Tables.load(s, dir, "events")
          .withColumn("delta",
            $"value".cast(DecimalType(30, 6)) -
              lag($"value", 1).over(w).cast(DecimalType(30, 6)))
          .withColumn("rn", row_number().over(w))
          .withColumn("gsum",
            sum(when($"delta" > 0, $"delta").otherwise(zero)).over(f14))
          .withColumn("lsum",
            sum(when($"delta" < 0, -$"delta").otherwise(zero)).over(f14))
          .filter($"rn" >= 15)
          .select($"event_type", $"event_id",
            when($"lsum" === 0, lit(100.0))
              .otherwise(lit(100.0) - lit(100.0) /
                (lit(1.0) + $"gsum".cast("double") / $"lsum".cast("double")))
              .as("rsi"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, event_id, ts,
                 CAST(value AS DECIMAL(30,6)) -
                   lag(CAST(value AS DECIMAL(30,6)), 1) OVER
                     (PARTITION BY event_type ORDER BY ts, event_id) AS delta,
                 row_number() OVER
                   (PARTITION BY event_type ORDER BY ts, event_id) AS rn
          FROM events),
        g AS (
          SELECT event_type, event_id, rn,
                 SUM(CASE WHEN delta > 0 THEN delta
                          ELSE CAST(0 AS DECIMAL(30,6)) END) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS gsum,
                 SUM(CASE WHEN delta < 0 THEN -delta
                          ELSE CAST(0 AS DECIMAL(30,6)) END) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lsum
          FROM d)
        SELECT event_type, event_id,
               CASE WHEN lsum = 0 THEN CAST(100.0 AS DOUBLE)
                    ELSE CAST(100.0 AS DOUBLE) - CAST(100.0 AS DOUBLE) /
                      (CAST(1.0 AS DOUBLE) +
                       CAST(gsum AS DOUBLE) / CAST(lsum AS DOUBLE)) END AS rsi
        FROM g WHERE rn >= 15""")),

    // ------------------------------------------------------------------
    // The halo-chunked RSI as a first-class registry row, against the
    // IDENTICAL DuckDB oracle as ts_rsi — the strongest possible claim
    // for a parallelization: same answer, hash-exact, at every gate the
    // driver runs. Chunk granularity adapts to the fixture: days when
    // every interior (series, day) clears the 14-row halo, else months
    // (the guard inside rsiChunked is the arbiter — correctness is
    // checked, never assumed).
    "ts_rsi_chunked" -> QuerySpec(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        // Catch ONLY the halo guard's dedicated type: an unrelated
        // IllegalArgumentException from Spark analysis must surface, not
        // be misread as "halo too small" and silently retried coarser.
        try rsiChunked(ev, date_trunc("day", col("ts")))
        catch { case _: HaloChunk.HaloTooSmallException =>
          rsiChunked(ev, date_trunc("month", col("ts")))
        }
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, event_id, ts,
                 CAST(value AS DECIMAL(30,6)) -
                   lag(CAST(value AS DECIMAL(30,6)), 1) OVER
                     (PARTITION BY event_type ORDER BY ts, event_id) AS delta,
                 row_number() OVER
                   (PARTITION BY event_type ORDER BY ts, event_id) AS rn
          FROM events),
        g AS (
          SELECT event_type, event_id, rn,
                 SUM(CASE WHEN delta > 0 THEN delta
                          ELSE CAST(0 AS DECIMAL(30,6)) END) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS gsum,
                 SUM(CASE WHEN delta < 0 THEN -delta
                          ELSE CAST(0 AS DECIMAL(30,6)) END) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lsum
          FROM d)
        SELECT event_type, event_id,
               CASE WHEN lsum = 0 THEN CAST(100.0 AS DOUBLE)
                    ELSE CAST(100.0 AS DOUBLE) - CAST(100.0 AS DOUBLE) /
                      (CAST(1.0 AS DOUBLE) +
                       CAST(gsum AS DOUBLE) / CAST(lsum AS DOUBLE)) END AS rsi
        FROM g WHERE rn >= 15""")),

    // ------------------------------------------------------------------
    // Stochastic oscillator %K/%D-14: %K positions the current value inside
    // the rolling 14-row low/high envelope (rolling MIN/MAX — exact on
    // doubles, no accumulation drift possible), %D smooths %K as an
    // EXPLICIT 3-term lag average rather than a 3-row window SUM: a
    // window sum over doubles may tree-combine in engine-specific order,
    // while (k + lag1) + lag2 pins the addition order on both sides. The
    // flat-envelope branch (high = low) is pinned to 50 — Spark would give
    // ±Inf/NaN, DuckDB NULL. Same single-window shape as ts_rsi.
    "ts_stochastic" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
        val f14 = w.rowsBetween(-13, 0)
        Tables.load(s, dir, "events")
          .withColumn("lo", min($"value").over(f14))
          .withColumn("hi", max($"value").over(f14))
          .withColumn("rn", row_number().over(w))
          // Divide BEFORE scaling: x/y with x ≤ y can never round above
          // 1.0, so %K is exactly bounded by [0, 100]; the 100·x/y order
          // can exceed 100 by an ulp (observed at sf0.001).
          .withColumn("k",
            when($"hi" === $"lo", lit(50.0))
              .otherwise(($"value" - $"lo") / ($"hi" - $"lo") * lit(100.0)))
          .withColumn("d",
            ($"k" + lag($"k", 1).over(w) + lag($"k", 2).over(w)) / lit(3.0))
          .filter($"rn" >= 16)
          .select($"event_type", $"event_id", $"k", $"d")
      },
      oracle = Some("""
        WITH env AS (
          SELECT event_type, event_id, ts, value,
                 MIN(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lo,
                 MAX(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hi,
                 row_number() OVER
                   (PARTITION BY event_type ORDER BY ts, event_id) AS rn
          FROM events),
        kk AS (
          SELECT event_type, event_id, ts, rn,
                 CASE WHEN hi = lo THEN CAST(50.0 AS DOUBLE)
                      ELSE (value - lo) / (hi - lo) * CAST(100.0 AS DOUBLE)
                 END AS k
          FROM env),
        dd AS (
          -- %D in its own CTE: a WHERE in the same SELECT as the lag
          -- windows would filter BEFORE they evaluate (SQL's WHERE runs
          -- ahead of the select-list), emptying the first rows' lags.
          SELECT event_type, event_id, rn, k,
                 (k + lag(k, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                    + lag(k, 2) OVER (PARTITION BY event_type ORDER BY ts, event_id))
                   / CAST(3.0 AS DOUBLE) AS d
          FROM kk)
        SELECT event_type, event_id, k, d
        FROM dd WHERE rn >= 16""")),

    // ------------------------------------------------------------------
    // The halo-chunked stochastic oscillator as a first-class registry
    // row against the IDENTICAL oracle as ts_stochastic — same claim as
    // ts_rsi_chunked: the parallelized plan hash-matches the global
    // window at every gate the driver runs. Day chunks when every
    // interior (series, day) clears the 15-row halo, else months (the
    // HaloChunk guard is the arbiter — correctness checked, not assumed).
    // ts_rolling_beta/corr's 24-row frames are NOT worth chunking: they
    // run over the hourly grid, which is calendar-bounded (≤ 8,760
    // rows/series/year regardless of data volume) — the raw-event window
    // here is the one whose sort grows with the data.
    "ts_stochastic_chunked" -> QuerySpec(
      fn = (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        try stochasticChunked(ev, date_trunc("day", col("ts")))
        catch { case _: HaloChunk.HaloTooSmallException =>
          stochasticChunked(ev, date_trunc("month", col("ts")))
        }
      },
      oracle = Some("""
        WITH env AS (
          SELECT event_type, event_id, ts, value,
                 MIN(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lo,
                 MAX(value) OVER
                   (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS hi,
                 row_number() OVER
                   (PARTITION BY event_type ORDER BY ts, event_id) AS rn
          FROM events),
        kk AS (
          SELECT event_type, event_id, ts, rn,
                 CASE WHEN hi = lo THEN CAST(50.0 AS DOUBLE)
                      ELSE (value - lo) / (hi - lo) * CAST(100.0 AS DOUBLE)
                 END AS k
          FROM env),
        dd AS (
          SELECT event_type, event_id, rn, k,
                 (k + lag(k, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id)
                    + lag(k, 2) OVER (PARTITION BY event_type ORDER BY ts, event_id))
                   / CAST(3.0 AS DOUBLE) AS d
          FROM kk)
        SELECT event_type, event_id, k, d
        FROM dd WHERE rn >= 16"""))
  )
}
