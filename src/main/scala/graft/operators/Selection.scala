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
  *   1. domain pass — per-group (min, max, n), O(groups) rows, map-side
  *      combined;
  *   2. histogram pass — values binned into ≤ [[targetBuckets]] buckets
  *      whose WIDTH DERIVES FROM THE OBSERVED DOMAIN, counts collected
  *      to the driver and cumsum'd there (O(groups × buckets) driver
  *      rows — bounded by construction, NOT by the value range: epoch
  *      micros and unit prices cost the same. A fixed absolute bucket
  *      width here couples driver memory to the domain — 64-wide
  *      buckets on a micros column would collect millions of rows);
  *   3. residual pass — only the buckets holding a requested rank are
  *      re-scanned (literal predicates, no join) and locally
  *      row-numbered for the exact element.
  *
  * Selection is BY VALUE: the k-th element's value is the smallest v
  * with cdf(v) ≥ k, so tie order inside a bucket cannot change the
  * selected value and a rank-spelling oracle (full sort + row_number
  * with any tiebreak) matches bit-for-bit.
  *
  * Driver state is O(groups × buckets) — the k-means-centroid
  * discipline. Intended for bounded group cardinality (status codes,
  * sources, shards); a million-group quantile belongs in a per-group
  * aggregate, not driver state.
  */
object Selection {

  val targetBuckets = 4096

  /** Exact per-group quantiles at the given fractions, ceil-rank
    * (lower-quantile) semantics: rank = ceil(q·n). Returns
    * ((group, fraction) -> value, histogram rows observed) — the second
    * component exists so tests can pin the driver-row bound. */
  def groupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      fractions: Seq[Double]): (Map[(String, Double), Double], Long) = {
    val g = col(groupCol)

    // Phase 1: per-group domain. O(groups) driver rows.
    val dom = df.select(g.as("g"), valueCol.as("v"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(col("v")).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap

    // Degenerate-width guard: a constant column bins everything into
    // bucket 0, which is exactly right.
    def widthOf(mn: Double, mx: Double): Double = {
      val w = (mx - mn) / targetBuckets
      if (w > 0 && java.lang.Double.isFinite(w)) w else 1.0
    }
    val mnCol = dom.foldLeft(lit(0.0)) { case (acc, (grp, (mn, _, _))) =>
      when(col("g") === grp, lit(mn)).otherwise(acc)
    }
    val wCol = dom.foldLeft(lit(1.0)) { case (acc, (grp, (mn, mx, _))) =>
      when(col("g") === grp, lit(widthOf(mn, mx))).otherwise(acc)
    }

    // Phase 2: domain-relative histogram. floor((v-mn)/w) is monotone in
    // v for positive w, and the residual pass bins with the IDENTICAL
    // expression, so boundary placement is consistent by construction.
    val bucketed = df.select(g.as("g"), valueCol.as("v"))
      .withColumn("bkt", floor((col("v") - mnCol) / wCol).cast("long"))
    val hist = bucketed.groupBy(col("g"), col("bkt"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // Driver cumsum → for each (group, fraction): its bucket and the rank
    // WITHIN that bucket.
    val targets: Map[(String, Double), (Long, Long)] =
      hist.groupBy(_._1).flatMap { case (grp, rows) =>
        val sorted = rows.sortBy(_._2)
        val n = dom(grp)._3
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
  def groupMedian(df: DataFrame, groupCol: String, valueCol: Column): Map[String, Double] =
    groupQuantiles(df, groupCol, valueCol, Seq(0.5))._1
      .map { case ((grp, _), v) => grp -> v }
}
