package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (UDAF surface, SURVEY §2.9): per-group top-k with a
  * total-order tiebreak, maintained as a bounded sorted buffer.
  *
  * This is the `Aggregator[IN, BUF, OUT]` pattern the engine uses wherever
  * a sketch-like aggregate isn't built in: the buffer is a small fixed-k
  * case class (cheap product encoder — never kryo blobs), `reduce` keeps it
  * bounded so shuffle volume is O(groups × k) regardless of input size, and
  * `merge` makes it partial-aggregation friendly (map-side combine works).
  * The grouped top-k it computes here also has a window-function spelling —
  * which is exactly what lets the differential oracle pin it.
  */
object TopKAggregator {

  /** Bounded buffer: parallel arrays sorted by (value desc, key asc). */
  final case class Buf(values: Array[Double], keys: Array[Long])

  final case class Scored(key: Long, value: Double)

  /** Top-k (value desc, key asc) over (key, value) pairs. */
  def topK(k: Int): Aggregator[Scored, Buf, Seq[Scored]] =
    new Aggregator[Scored, Buf, Seq[Scored]] {
      private def insert(b: Buf, key: Long, value: Double): Buf = {
        val n = b.keys.length
        // find insertion point in (value desc, key asc) order
        var i = 0
        while (i < n && (b.values(i) > value ||
          (b.values(i) == value && b.keys(i) < key))) i += 1
        if (i >= k) return b
        val m = math.min(n + 1, k)
        val vs = new Array[Double](m)
        val ks = new Array[Long](m)
        System.arraycopy(b.values, 0, vs, 0, i)
        System.arraycopy(b.keys, 0, ks, 0, i)
        vs(i) = value; ks(i) = key
        val tail = m - i - 1
        if (tail > 0) {
          System.arraycopy(b.values, i, vs, i + 1, tail)
          System.arraycopy(b.keys, i, ks, i + 1, tail)
        }
        Buf(vs, ks)
      }

      override def zero: Buf = Buf(Array.empty, Array.empty)
      override def reduce(b: Buf, a: Scored): Buf = insert(b, a.key, a.value)
      override def merge(x: Buf, y: Buf): Buf =
        (0 until y.keys.length).foldLeft(x)((b, i) => insert(b, y.keys(i), y.values(i)))
      override def finish(b: Buf): Seq[Scored] =
        (0 until b.keys.length).map(i => Scored(b.keys(i), b.values(i)))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Scored]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
}
