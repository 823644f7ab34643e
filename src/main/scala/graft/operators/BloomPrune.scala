package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime bloom pre-filter for non-broadcastable joins — the engine-level
  * analog of Spark's `InjectRuntimeFilter`, driven by the same mergeable
  * bit_or sketch that `rel_bloom_prune` measures.
  *
  * The situation it exists for: fact ⋈ dim where the dim side is too big
  * to broadcast (so the join must shuffle BOTH sides), but the dim's JOIN
  * KEY SET still fits a fixed-size bitmap. The sketch is built with one
  * small aggregation over the dim keys (bit_or partials combine map-side
  * — 1000 executors each fold their slice into 2^20 bits locally and the
  * driver merges 16 k words), then rides into the fact scan as a 128 KB
  * array LITERAL inside a codegen'd filter: 4 xxhash64 probes + 2 array
  * lookups per row, no join, no exchange. The fact rows that shuffle are
  * cut to (dim selectivity + FP rate) of the table — at 100 TB that is
  * the difference between shuffling the table and shuffling a percent of
  * it. Semantics are EXACT end-to-end: the real join still verifies every
  * survivor, so false positives cost only wasted shuffle rows and false
  * negatives are impossible (every dim key sets its own bits).
  *
  * The filter cannot reach parquet ROW-GROUP pruning (a hash-of-key
  * predicate has no min/max form) — the saving is shuffle volume and
  * join-probe work, not scan I/O; column pruning and any residual
  * pushable predicates are unaffected.
  *
  * Hash note: probes use `xxhash64(i, key)`, NOT the portable md5 of the
  * oracle-checked sketch queries — the filter is semantics-transparent,
  * so the cheapest codegen'd hash wins and no cross-engine parity is
  * needed.
  */
object BloomPrune {

  /** 2^20 bits = 16 k words = 128 KB — always broadcastable; ~0.04 % FP
    * at 40 k build keys, k = 4. */
  val bits: Int = 1 << 20
  val nWords: Int = bits / 64

  private val pow2: Array[Long] = Array.tabulate(64)(i => 1L << i)

  /** Dense word bitmap over the DISTINCT values of the single-column
    * `keys` frame. One bounded aggregation (≤ nWords output rows),
    * O(128 KB) driver state. */
  def buildWords(keys: DataFrame): Array[Long] = {
    val kc = col(keys.columns.head)
    val rows = keys
      .select(explode(expr("sequence(0, 3)")).as("i"), kc.as("k"))
      .select((xxhash64(col("i"), col("k")) bitwiseAND lit((bits - 1).toLong))
        .as("p"))
      .groupBy(shiftright(col("p"), 6).cast("int").as("w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"))
        .as("bm"))
      .collect()
    val arr = new Array[Long](nWords)
    rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership predicate over the collected bitmap: pure codegen'd
    * column expression (4 hash probes, constant-shift word/bit lookups
    * via two array literals — no variable shift, no UDF, no join). */
  def mayContain(words: Array[Long], key: Column): Column = {
    val wl = typedLit(words)
    val pl = typedLit(pow2)
    (0 until 4).map { i =>
      val p = xxhash64(lit(i), key) bitwiseAND lit((bits - 1).toLong)
      val word = element_at(wl, shiftright(p, 6).cast("int") + 1)
      val mask = element_at(pl, (p % 64).cast("int") + 1)
      (word bitwiseAND mask) =!= 0L
    }.reduce(_ && _)
  }
}
