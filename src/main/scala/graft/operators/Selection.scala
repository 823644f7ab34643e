package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact selection (k-th smallest value per group) by
  * two-phase histogram refinement — the scale-sound replacement for a
  * per-group total sort, whose parallelism collapses to |groups| and
  * whose hot partition is the whole group.
  *
  * Phases (each a cheap columnar scan, no group-wide sort anywhere):
  *   1. domain pass — ONE ungrouped (min, max) of the value column,
  *      skipped when the caller already knows a conservative bound
  *      (e.g. a derived column whose range follows analytically from a
  *      previous selection — see `rel_agg_mad`);
  *   2. histogram pass — values binned into buckets whose WIDTH DERIVES
  *      FROM THE OBSERVED DOMAIN (range / [[targetBuckets]]), counts
  *      collected to the driver and cumsum'd there. Driver rows are
  *      ≤ groups × targetBuckets BY CONSTRUCTION — decoupled from the
  *      value range: epoch micros and unit prices cost the same. (A
  *      fixed absolute bucket width here couples driver memory to the
  *      domain — 64-wide buckets on a micros column would collect
  *      millions of rows.) A global width is deliberately shared by all
  *      groups: each group's bucket count is (group range / width)
  *      ≤ targetBuckets, and the width literal keeps the binning
  *      expression CASE-free;
  *   3. residual pass — only the buckets holding a requested rank are
  *      re-scanned (literal predicates, no join) and locally
  *      row-numbered for the exact element.
  *
  * Selection is BY VALUE: the k-th element's value is the smallest v
  * with cdf(v) ≥ k, so tie order inside a bucket cannot change the
  * selected value and a rank-spelling oracle (full sort + row_number
  * with any tiebreak) matches bit-for-bit. Binning uses one shared
  * floor((v − lo) / w) expression in both scans — exact-double ops, so
  * boundary placement is consistent by construction, and monotone in v
  * (no transcendental whose 1-ulp wobble could reorder a boundary).
  *
  * Driver state is O(groups × buckets) — the k-means-centroid
  * discipline. Intended for bounded group cardinality (status codes,
  * sources, shards); a million-group quantile belongs in a per-group
  * aggregate, not driver state.
  */
object Selection {

  val targetBuckets = 4096

  /** Hard cap on histogram rows pulled to the driver (groups × buckets
    * by construction). 4M rows ≈ a few hundred MB of driver heap — past
    * this the caller is grouping on a high-cardinality key and the
    * selection belongs in an in-plan window/sort spelling, so we fail
    * loudly instead of silently swelling the driver. */
  val maxDriverRows = 4 * 1024 * 1024

  /** Exact per-group quantiles at the given fractions, ceil-rank
    * (lower-quantile) semantics: rank = ceil(q·n). `domain`, when given,
    * must be a CONSERVATIVE [lo, hi] bound on every value (bounds may be
    * loose — a loose range only coarsens buckets, never exceeds the
    * count bound) and saves the domain job. Returns
    * ((group, fraction) -> value, histogram rows observed) — the second
    * component exists so tests can pin the driver-row bound. Empty
    * input returns (Map.empty, 0). Throws IllegalStateException when
    * the histogram would exceed [[maxDriverRows]]. */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      fractions: Seq[Double],
      domain: Option[(Double, Double)] = None,
      maxRows: Int = maxDriverRows): (Map[(String, Double), Double], Long) = {
    val g = col(groupCol)
    val narrow = df.select(g.as("g"), valueCol.as("v"))

    // Phase 1: one ungrouped min/max (2 driver rows) unless supplied.
    // A null min on a double column means zero (non-null) rows — a
    // defined empty result, not a downstream NPE.
    val (lo, hi) = domain.getOrElse {
      val r = narrow.agg(min(col("v")), max(col("v"))).collect()(0)
      if (r.isNullAt(0)) return (Map.empty, 0L)
      (r.getDouble(0), r.getDouble(1))
    }
    // Degenerate-width guard: a constant column bins everything into
    // bucket 0, which is exactly right.
    val width = {
      val w = (hi - lo) / targetBuckets
      if (w > 0 && java.lang.Double.isFinite(w)) w else 1.0
    }

    // Phase 2: domain-relative histogram; per-group counts come free as
    // the per-group sum, so no separate count job.
    val bucketed = narrow
      .withColumn("bkt", floor((col("v") - lit(lo)) / lit(width)).cast("long"))
    // The limit bounds what ever reaches the driver: maxRows+1 rows trip
    // the guard without first materializing an oversized array.
    val histRows = bucketed.groupBy(col("g"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .limit(maxRows + 1)
      .collect()
    if (histRows.length > maxRows)
      throw new IllegalStateException(
        s"Selection histogram exceeds $maxRows driver rows (groups × " +
          s"$targetBuckets buckets) — group cardinality too high for " +
          "driver-refined selection; use an in-plan window/sort spelling.")
    val hist = histRows.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    if (hist.isEmpty) return (Map.empty, 0L)

    // Driver cumsum → for each (group, fraction): its bucket and the rank
    // WITHIN that bucket.
    val targets: Map[(String, Double), (Long, Long)] =
      hist.groupBy(_._1).flatMap { case (grp, rows) =>
        val sorted = rows.sortBy(_._2)
        val n = sorted.map(_._3).sum
        fractions.map { q =>
          val k = math.max(1L, math.ceil(q * n).toLong)
          var cum = 0L
          val (_, bkt, cnt) =
            sorted.find { case (_, _, c) => cum += c; cum >= k }.get
          (grp, q) -> ((bkt, k - (cum - cnt)))
        }
      }

    // Phase 3: residual — only target buckets, and only the REQUESTED
    // local ranks come back: the rn filter runs inside the plan, so the
    // driver sees exactly one row per (group, fraction) even when a
    // skewed point mass makes a target bucket O(n) rows. Few targets
    // (the common case) use literal predicates, which push to the scan;
    // many targets use a broadcast semi-join against the tiny target
    // list — a linear OR-chain over thousands of groups would both plan
    // poorly and overflow the expression-conversion stack.
    val wanted: Map[(String, Long), Set[Long]] = targets.toSeq
      .groupBy { case ((grp, _), (b, _)) => (grp, b) }
      .map { case (k, rows) => k -> rows.map(_._2._2).toSet }
    val wr = Window.partitionBy(col("g"), col("bkt")).orderBy(col("v"))
    val residualDf =
      if (wanted.size <= 128) {
        bucketed
          .filter(wanted.keys.map { case (grp, b) =>
            col("g") === grp && col("bkt") === b
          }.reduce(_ || _))
          .withColumn("rn", row_number().over(wr).cast("long"))
          .filter(wanted.map { case ((grp, b), ks) =>
            col("g") === grp && col("bkt") === b &&
              col("rn").isin(ks.toSeq: _*)
          }.reduce(_ || _))
      } else {
        val s = df.sparkSession
        import s.implicits._
        val bucketTargets = broadcast(
          wanted.keys.toSeq.toDF("tg", "tbkt"))
        val rankTargets = broadcast(
          targets.toSeq.map { case ((grp, _), (b, k)) => (grp, b, k) }
            .toDF("tg", "tbkt", "trn"))
        bucketed
          .join(bucketTargets,
            col("g") === col("tg") && col("bkt") === col("tbkt"), "leftsemi")
          .withColumn("rn", row_number().over(wr).cast("long"))
          .join(rankTargets,
            col("g") === col("tg") && col("bkt") === col("tbkt") &&
              col("rn") === col("trn"), "leftsemi")
      }
    val residual = residualDf
      .collect()
      .map(r => ((r.getString(0), r.getLong(2), r.getLong(3)), r.getDouble(1)))
      .toMap

    val out = targets.map { case ((grp, q), (bkt, localK)) =>
      (grp, q) -> residual((grp, bkt, localK))
    }
    (out, hist.length.toLong)
  }

  /** Exact per-group lower median — [[groupQuantiles]] at 0.5. */
  def groupMedian(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      domain: Option[(Double, Double)] = None): Map[String, Double] =
    groupQuantiles(df, groupCol, valueCol, Seq(0.5), domain)._1
      .map { case ((grp, _), v) => grp -> v }
}
