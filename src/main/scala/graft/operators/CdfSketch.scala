package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The mergeable CDF sketch (`rel_cdf_sketch`'s bucket-count table) as a
  * reusable typed `Aggregator` — one value per group instead of a query
  * spelling, SQL-registered as `cdf_sketch(v, lo, w)`.
  *
  * State is the fixed 513-slot bucket-count array over the caller-supplied
  * domain `[lo, lo + 513·w)` — (lo, w) must be constant for the
  * aggregation (the one-pass global min/max job of the query spelling, or
  * analytic bounds). Counts merge by element-wise SUM, so:
  *   - partial aggregation works (map-side combine on 1000 executors);
  *   - two shards' sketches merge into the corpus sketch EXACTLY
  *     (spec-pinned) — the property that makes the sketch maintainable
  *     incrementally ([[graft.streaming.CdfStream]] SUM-merges per-batch
  *     deltas into persisted state);
  *   - shuffle volume is O(groups × 513) regardless of input size.
  *
  * Quantile extraction ([[quantileEst]]) mirrors the query spelling's
  * arithmetic EXPRESSION-FOR-EXPRESSION (ceil-rank target, linear
  * interpolation inside the covering bucket), so the aggregator path is
  * row-exact against the `rel_cdf_sketch` DuckDB oracle — the value error
  * stays bounded by one bucket width by construction.
  */
object CdfSketch {

  /** Interior buckets; values at the domain top land in slot [[slots]]-1
    * (floor((mx−mn)/w) = 512 when w = (mx−mn)/512), giving 513 slots. */
  val buckets = 512
  val slots: Int = buckets + 1

  final case class In(v: Double, lo: Double, w: Double)
  final case class Buf(counts: Array[Long])

  /** Bucket index of `v` — the query spelling's floor((v−lo)/w), clamped
    * so conservative callers can pass loose bounds without corrupting the
    * array (with exact global bounds the clamp never fires and the sketch
    * is bit-identical to the spelling's bucket table). */
  private def slot(v: Double, lo: Double, w: Double): Int = {
    val i = math.floor((v - lo) / w)
    if (i < 0) 0 else if (i > buckets) buckets else i.toInt
  }

  val agg: Aggregator[In, Buf, Array[Long]] =
    new Aggregator[In, Buf, Array[Long]] {
      override def zero: Buf = Buf(new Array[Long](slots))
      override def reduce(b: Buf, a: In): Buf = {
        b.counts(slot(a.v, a.lo, a.w)) += 1; b
      }
      override def merge(x: Buf, y: Buf): Buf = {
        var i = 0
        while (i < slots) { x.counts(i) += y.counts(i); i += 1 }
        x
      }
      override def finish(b: Buf): Array[Long] = b.counts
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Register the SQL door: `cdf_sketch(v, lo, w)` → array<bigint>. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("cdf_sketch", udaf(agg))

  /** Total observations in a sketch column. */
  def countOf(sketch: Column): Column =
    aggregate(sketch, lit(0L), (acc, x) => acc + x)

  /** Ceil-rank quantile estimate from a sketch column — the identical
    * arithmetic of the `rel_cdf_sketch` spelling (k = ceil(q·n); inside
    * the covering bucket: lo + w·(bkt + (k − cum_before)/cnt)), spelled
    * as one fold over the 513 (cnt, bkt) slots. NULL on an empty sketch. */
  def quantileEst(sketch: Column, q: Double, lo: Column, w: Column): Column = {
    val n = countOf(sketch)
    val k = ceil(lit(q) * n).cast("long")
    val zipped = zip_with(sketch, sequence(lit(0), lit(buckets)),
      (c, i) => struct(c.as("cnt"), i.as("bkt")))
    val folded = aggregate(
      zipped,
      struct(lit(0L).as("cum"), lit(null).cast("double").as("est")),
      (acc, e) => {
        val cnt = e.getField("cnt")
        val cum = acc.getField("cum") + cnt
        val hit = acc.getField("est").isNull &&
          cum >= k && acc.getField("cum") < k
        struct(
          cum.as("cum"),
          when(hit,
            lo + w * (e.getField("bkt").cast("double") +
              (k - acc.getField("cum")).cast("double") / cnt.cast("double")))
            .otherwise(acc.getField("est")).as("est"))
      })
    folded.getField("est")
  }
}
