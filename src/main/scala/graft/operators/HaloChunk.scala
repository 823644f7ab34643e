package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Time-chunked execution for bounded-frame window pipelines — the reusable
  * form of the halo recipe `Finance.rsiChunked` proved (bit-identical to the
  * global window, 2.5× faster at sf10 on a coarse-partitioned series).
  *
  * The contract: if every window frame in a per-series computation is
  * bounded — each output row depends on at most its `halo` predecessors in
  * the (ts, tie) total order — then the series can be split into time
  * chunks, each chunk prefixed with the previous chunk's last `halo` rows
  * as read-only context, the identical window arithmetic run per
  * (series, chunk) partition, and the halo rows dropped: the concatenation
  * IS the global window's output, bit for bit (sums accumulate in the same
  * exact types over the same rows in the same order). The sort Spark pays
  * is per-chunk instead of per-series: parallelism = series × chunks, and
  * no task ever holds more than one chunk (+halo rows) of history — the
  * 100 TB shape for a coarse-partitioned series.
  *
  * Preconditions, both CHECKED loudly at plan-build time on the tiny
  * (series, chunk) directory (one Spark job; the directory is then kept
  * driver-side and broadcast back, so nothing is recomputed):
  *
  *  1. '''Halo coverage''' — every chunk that feeds a successor (all but
  *     each series' first and last) must hold ≥ `halo` rows, else its tail
  *     cannot cover the successor's frames. Violation throws
  *     [[HaloChunk.HaloTooSmallException]] — a dedicated type so callers
  *     can retry with a coarser chunking without masking unrelated
  *     `IllegalArgumentException`s from Spark analysis.
  *  2. '''Monotonicity''' — chunk order must equal time order: per series,
  *     consecutive chunks' (ts, tie) ranges must not overlap (prev chunk's
  *     max ts strictly below next chunk's min ts). A non-monotone chunk
  *     expression (e.g. `hour(ts)`, which repeats across days) would pass
  *     the size guard yet silently emit wrong frames; here it throws a
  *     plain `IllegalArgumentException` (NOT the retryable type — coarser
  *     chunking cannot fix a non-monotone expression). Strictness is the
  *     right bound: a chunk expression that is a function of ts maps equal
  *     ts to equal chunks, so a shared boundary ts implies a non-function
  *     and the halo/home sort order would interleave on the tie column.
  *
  * Usage:
  * {{{
  *   val ch = HaloChunk.prepare(base, Seq("event_type"), chunkExpr, halo = 14)
  *   val out = ch.df.withColumn("x", sum(...).over(ch.w.rowsBetween(-13, 0)))
  *   HaloChunk.finish(out, minGlobalRn = 15)   // drops halo rows + helpers
  * }}}
  */
object HaloChunk {

  /** Thrown ONLY by the halo-coverage precondition — callers fall back to a
    * coarser chunk expression on exactly this type. */
  final class HaloTooSmallException(msg: String)
      extends IllegalArgumentException(msg)

  /** The chunked frame: `df` holds home + halo rows with helper columns
    * (`_chunk`/`_idx`/`_is_halo`/`_grn`); `w` is the per-(series, chunk)
    * window every bounded-frame function must run over. Callers must not
    * filter or re-sort `df` before [[finish]] — halo rows are load-bearing
    * frame context. */
  final case class Chunked(df: DataFrame, w: WindowSpec)

  /** Chunk `base` by `chunkExpr` with a `halo`-row overlap per boundary.
    *
    * One eager Spark job builds the (series, chunk) directory — counts,
    * per-chunk ts ranges, chunk index, cumulative prior count — which is
    * collected to the driver (it is the SAME rows the subsequent broadcast
    * join ships there anyway), both preconditions are checked on it in
    * plain Scala, and the checked directory is re-created as a local
    * relation for the join: the directory aggregation runs exactly once.
    * The last chunk of each series contributes no halo (nothing consumes
    * it) — its tail rows are pre-filtered, not computed-then-dropped.
    *
    * `_grn` reconstructs each home row's GLOBAL row number within its
    * series without any global sort: (sum of prior chunks' counts) + the
    * row's home-rank within its chunk — callers gate warm-up rows with
    * `finish(df, minGlobalRn)` exactly as they would on a global
    * `row_number`. */
  def prepare(
      base0: DataFrame,
      seriesCols: Seq[String],
      chunkExpr: Column,
      halo: Int,
      tsCol: String = "ts",
      tieCol: String = "event_id"): Chunked = {
    require(halo > 0, s"halo must be positive, got $halo")
    val spark = base0.sparkSession
    val sCols = seriesCols.map(col)
    val base = base0.withColumn("_chunk", chunkExpr)

    val wIdx = Window.partitionBy(sCols: _*).orderBy(col("_chunk"))
    // The directory: O(series × chunks) rows. Violation flags are computed
    // as Spark booleans so the driver-side check needs no knowledge of the
    // chunk/ts types' ordering.
    val dirFull = base
      .groupBy((sCols :+ col("_chunk")): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        min(struct(col(tsCol), col(tieCol))).as("_min_k"),
        max(struct(col(tsCol), col(tieCol))).as("_max_k"))
      .withColumn("_idx", row_number().over(wIdx))
      .withColumn("_prior",
        coalesce(
          sum(col("_cnt")).over(wIdx.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("_n_chunks",
        count(lit(1)).over(Window.partitionBy(sCols: _*)))
      .withColumn("_undersized",
        col("_idx") > 1 && col("_idx") < col("_n_chunks") && col("_cnt") < halo)
      .withColumn("_overlap",
        coalesce(!(lag(col("_max_k"), 1).over(wIdx) < col("_min_k")), lit(false)))
    val keep = (sCols :+ col("_chunk") :+ col("_idx") :+ col("_prior") :+
      col("_n_chunks")) :+ col("_undersized") :+ col("_overlap")
    val dirRows: Array[Row] = dirFull.select(keep: _*).collect()

    val overlap = dirRows.filter(_.getAs[Boolean]("_overlap"))
    if (overlap.nonEmpty)
      throw new IllegalArgumentException(
        "HaloChunk: chunk order does not match time order — consecutive " +
          s"chunks' ($tsCol, $tieCol) ranges overlap for " +
          s"${overlap.length} (series, chunk) pairs, e.g. " +
          s"${overlap.head.toSeq.take(seriesCols.length + 1).mkString("(", ", ", ")")}. " +
          "The chunk expression must be a monotone non-decreasing function " +
          s"of $tsCol (e.g. date_trunc — NOT hour-of-day, which repeats); " +
          "a non-monotone chunking would silently emit wrong frames.")
    val undersized = dirRows.filter(_.getAs[Boolean]("_undersized"))
    if (undersized.nonEmpty)
      throw new HaloTooSmallException(
        s"HaloChunk: ${undersized.length} interior chunk(s) hold < $halo " +
          "rows — their halo cannot cover the next chunk's frames, e.g. " +
          s"${undersized.head.toSeq.take(seriesCols.length + 1).mkString("(", ", ", ")")}; " +
          "choose a coarser chunk expression")

    // Checked directory back to the executors as a local relation — tiny,
    // broadcast, never recomputed.
    val dirSchema = dirFull.select(keep.dropRight(2): _*).schema
    val dir = spark.createDataFrame(
      java.util.Arrays.asList(dirRows.map(r =>
        Row.fromSeq(r.toSeq.dropRight(2))): _*), dirSchema)

    val indexed = base.join(broadcast(dir), seriesCols :+ "_chunk")
    val home = indexed.withColumn("_is_halo", lit(false))
    // Each chunk's last `halo` rows re-home to idx + 1 as frame context;
    // the series-final chunk feeds nobody and is excluded up front.
    val wTail = Window.partitionBy((sCols :+ col("_idx")): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    val tail = indexed.filter(col("_idx") < col("_n_chunks"))
      .withColumn("_fe", row_number().over(wTail))
      .filter(col("_fe") <= halo).drop("_fe")
      .withColumn("_idx", col("_idx") + 1)
      .withColumn("_prior", lit(null).cast("long")) // halo never emits
      .withColumn("_is_halo", lit(true))
    val w = Window.partitionBy((sCols :+ col("_idx")): _*)
      .orderBy(col(tsCol), col(tieCol))
    val df = home.unionByName(tail)
      .withColumn("_grn",
        col("_prior") + sum(when(col("_is_halo"), 0L).otherwise(1L))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    Chunked(df, w)
  }

  /** Drop halo rows and warm-up rows (global row number < `minGlobalRn`,
    * matching the `rn >= k` gate of the equivalent global-window plan) and
    * the helper columns. */
  def finish(df: DataFrame, minGlobalRn: Long): DataFrame =
    df.filter(!col("_is_halo") && col("_grn") >= minGlobalRn)
      .drop("_chunk", "_idx", "_prior", "_n_chunks", "_is_halo", "_grn")
}
