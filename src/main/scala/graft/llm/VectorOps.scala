package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Shared vector expressions for the embedding operators. All pure Catalyst
  * (codegen-able higher-order functions) — no UDFs, no driver-side math.
  */
object VectorOps {

  /** float[] → double[] so all arithmetic is in double (matches the oracle's
    * explicit CAST ... AS DOUBLE element math). */
  def asDouble(colName: String): Column =
    expr(s"transform($colName, x -> CAST(x AS DOUBLE))")

  /** Sequential-fold cosine between two double-array columns. The fold order
    * (left-to-right, zero init) matches DuckDB's list_reduce, so results are
    * bit-identical to the oracle. */
  def cosine(a: String, b: String): Column =
    expr(s"""
      aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
      / (sqrt(aggregate($a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))
         * sqrt(aggregate($b, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)))""")

  /** Random-hyperplane LSH codes over a 64-dim double-array column:
    * `tables` tables × `bits` sign bits. Hyperplane components are
    * pseudo-random doubles in [-1, 1] derived from xxhash64(table:bit:dim) —
    * fully deterministic, no RNG state to broadcast. Returns an
    * array<struct<t:int, code:int>> expression over column `ve`. */
  def lshCodes(tables: Int = 4, bits: Int = 8, dims: Int = 64): Column =
    expr(s"""
      transform(sequence(0, ${tables - 1}), t -> named_struct('t', t, 'code',
        aggregate(sequence(0, ${bits - 1}), 0, (acc, j) ->
          acc * 2 + CASE WHEN
            aggregate(sequence(1, $dims), CAST(0.0 AS DOUBLE), (s, i) ->
              s + element_at(ve, i) *
                  (CAST(pmod(xxhash64(concat(t, ':', j, ':', i)), 2001) AS DOUBLE)
                   / 1000.0 - 1.0)) >= 0.0
          THEN 1 ELSE 0 END)))""")
}
