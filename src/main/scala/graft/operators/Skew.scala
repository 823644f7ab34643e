package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join splitting (on by default in [[graft.GraftSession]])
  * handles most cases at runtime; explicit salting remains the tool when a
  * single key is so hot that even split partitions overwhelm one executor,
  * or when the build side must stay a shuffle join. The salt mixes a hash
  * of the probe row with a per-row ordinal, so even fully-identical rows of
  * a hot key (the common sentinel-key skew case) spread across all n salts;
  * the join RESULT is salt-independent, so this costs no determinism.
  *
  * Cost model: the probe side gets an extra narrow column; the build side
  * is replicated n times — choose n ≈ (hot-key rows / rows-per-task), and
  * keep the build side the smaller input.
  */
object Skew {

  /** Inner equi-join `left.key == right.key`, salted n ways: each left row
    * carries one deterministic salt; each right row is replicated across
    * all n salts, so every matching pair appears exactly once — identical
    * multiplicity to the unsalted join, but the shuffle key becomes
    * (key, salt), spreading a hot key over n partitions. */
  /** The probe-side salt column: hash of the full row mixed with a per-row
    * ordinal, mod n — identical rows of a hot key still spread. */
  def saltColumn(df: DataFrame, n: Int): Column = {
    val cols: Array[Column] = df.columns.map(col)
    pmod(xxhash64(struct(cols.toIndexedSeq: _*), monotonically_increasing_id()),
      lit(n.toLong))
  }

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      n: Int): DataFrame = {
    require(n > 0, s"salt count must be positive, got $n")
    val l = left.withColumn("__salt", saltColumn(left, n))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
