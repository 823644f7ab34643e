package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: `simhash64(array<string>) → bigint` — the
  * 64-bit SimHash of a token sequence.
  *
  * Each token is hashed once (XXH64, seed 42 — the same family as the
  * built-in `xxhash64`); every occurrence contributes ±1 per bit position
  * to a 64-wide tally, and the fingerprint takes the sign of each tally
  * (ties → 1, matching the previous `>= 0` built-in formulation). Exact
  * integer arithmetic with a fixed traversal order: bit-deterministic.
  *
  * Replaces a 64×|tokens| row expansion through a broadcast join and two
  * hash aggregations with one codegen loop per row.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = classOf[SimHash64].getName
      s"${ev.value} = $cls.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val tally = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // Null elements contribute nothing (the registered SQL surface admits
      // containsNull arrays; the engine's split() inputs never do).
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
