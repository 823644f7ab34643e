package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: `hyperplane_codes(array<double>) →
  * array<int>` — random-hyperplane LSH codes (`tables` tables × `bits` sign
  * bits each) for cosine similarity search.
  *
  * Same rationale as [[MinHashSig]]: composed from built-ins this is three
  * nested higher-order lambdas (table × bit × dim), all interpreted; here it
  * is one tight codegen loop. Hyperplane components are pseudo-random
  * doubles in [-1, 1] derived from XXH64 of (table, bit, dim) — identical on
  * every executor with zero state to broadcast, and the per-element
  * evaluation order is fixed, so codes are bit-deterministic (a groupBy
  * reduction over doubles would not be).
  */
case class HyperplaneCodes(child: Expression, tables: Int = 4, bits: Int = 16)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_codes expects array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      var j = 0
      while (j < bits) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += v.getDouble(i) * HyperplaneCodes.component(t, j, i)
          i += 1
        }
        code = (code << 1) | (if (dot >= 0.0) 1 else 0)
        j += 1
      }
      codes(t) = code
      t += 1
    }
    ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // Scala emits a static forwarder for the companion's `component` on
      // the class itself — plain Java-callable from generated code.
      val cls = classOf[HyperplaneCodes].getName
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val code = ctx.freshName("code")
      val n = ctx.freshName("n")
      s"""
        int[] $codes = new int[$tables];
        final int $n = $c.numElements();
        for (int $t = 0; $t < $tables; $t++) {
          int $code = 0;
          for (int $j = 0; $j < $bits; $j++) {
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += $c.getDouble($i) * $cls.component($t, $j, $i);
            }
            $code = ($code << 1) | ($dot >= 0.0 ? 1 : 0);
          }
          $codes[$t] = $code;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($codes);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}

object HyperplaneCodes {
  /** Pseudo-random hyperplane component in [-1, 1] for (table, bit, dim). */
  def component(t: Int, j: Int, i: Int): Double = {
    val key = (t.toLong << 40) | (j.toLong << 24) | i.toLong
    val h = XXH64.hashLong(key, 42L)
    (((h % 2001L) + 2001L) % 2001L).toDouble / 1000.0 - 1.0
  }
}
