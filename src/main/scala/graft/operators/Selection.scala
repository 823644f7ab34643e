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

  /** Exact per-group quantiles at the given fractions, ceil-rank
    * (lower-quantile) semantics: rank = ceil(q·n). `domain`, when given,
    * must be a CONSERVATIVE [lo, hi] bound on every value (bounds may be
    * loose — a loose range only coarsens buckets, never exceeds the
    * count bound) and saves the domain job. Returns
    * ((group, fraction) -> value, histogram rows observed) — the second
    * component exists so tests can pin the driver-row bound. */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      fractions: Seq[Double],
      domain: Option[(Double, Double)] = None): (Map[(String, Double), Double], Long) = {
    val g = col(groupCol)
    val narrow = df.select(g.as("g"), valueCol.as("v"))

    // Phase 1: one ungrouped min/max (2 driver rows) unless supplied.
    val (lo, hi) = domain.getOrElse {
      val r = narrow.agg(min(col("v")), max(col("v"))).collect()(0)
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
    val hist = bucketed.groupBy(col("g"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

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

    // Phase 3: residual — only target buckets, literal predicates.
    val wr = Window.partitionBy(col("g"), col("bkt")).orderBy(col("v"))
    val residual = bucketed
      .filter(targets.map { case ((grp, _), (b, _)) =>
        col("g") === grp && col("bkt") === b
      }.reduce(_ || _))
      .withColumn("rn", row_number().over(wr).cast("long"))
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
