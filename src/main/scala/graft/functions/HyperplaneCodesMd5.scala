package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `hyperplane_codes_md5(array<double>) →
  * array<int>` — sign-random-projection LSH codes (4 tables × 16 bits) with
  * RADEMACHER (±1) hyperplane entries derived from the cross-engine MD5
  * hash ([[Md5Hash]]).
  *
  * Differences from [[HyperplaneCodes]] (xxhash64, uniform [-1,1] entries):
  *   - ±1 entries make each dot product a signed SUM of vector elements in
  *     fixed order — multiplication by ±1.0 is IEEE-exact — so a DuckDB
  *     oracle can rebuild the exact same bits with an ordered
  *     `list_reduce` and `md5_number_upper`. Rademacher projections carry
  *     the same Johnson–Lindenstrauss guarantees as Gaussian ones
  *     (Achlioptas 2001), so nothing is lost statistically.
  *   - entries for the common (≤128-dim) case are precomputed ONCE per JVM
  *     into a flat table at class load — the per-row hot loop is pure
  *     multiply-accumulate, no hashing at all (faster than the xxhash
  *     variant, which hashes per element).
  */
case class HyperplaneCodesMd5(child: Expression) extends UnaryExpression {
  import HyperplaneCodesMd5.{Tables, Bits}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_codes_md5 expects array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_codes_md5"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Int](Tables)
    var t = 0
    while (t < Tables) {
      var code = 0
      var j = 0
      while (j < Bits) {
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += v.getDouble(i) * HyperplaneCodesMd5.weight(t, j, i)
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
      val cls = classOf[HyperplaneCodesMd5].getName
      val codes = ctx.freshName("codes")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val code = ctx.freshName("code")
      val n = ctx.freshName("n")
      s"""
        int[] $codes = new int[$Tables];
        final int $n = $c.numElements();
        for (int $t = 0; $t < $Tables; $t++) {
          int $code = 0;
          for (int $j = 0; $j < $Bits; $j++) {
            double $dot = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $dot += $c.getDouble($i) * $cls.weight($t, $j, $i);
            }
            $code = ($code << 1) | ($dot >= 0.0 ? 1 : 0);
          }
          $codes[$t] = $code;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($codes);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodesMd5 =
    copy(child = newChild)
}

object HyperplaneCodesMd5 {
  val Tables = 4
  val Bits = 16

  /** Dimensions covered by the precomputed table; higher dims hash lazily. */
  val MaxCachedDim = 128

  /** ±1 from the low bit of md5_long("hp:t:j:i") — the exact expression the
    * DuckDB oracle writes as
    * `md5_number_upper('hp:'||t||':'||j||':'||i) & 1`. */
  def rademacher(t: Int, j: Int, i: Int): Double =
    if ((Md5Hash.hash(UTF8String.fromString(s"hp:$t:$j:$i")) & 1L) == 1L) 1.0
    else -1.0

  private val cache: Array[Double] = {
    val a = new Array[Double](Tables * Bits * MaxCachedDim)
    var t = 0
    while (t < Tables) {
      var j = 0
      while (j < Bits) {
        var i = 0
        while (i < MaxCachedDim) {
          a((t * Bits + j) * MaxCachedDim + i) = rademacher(t, j, i)
          i += 1
        }
        j += 1
      }
      t += 1
    }
    a
  }

  def weight(t: Int, j: Int, i: Int): Double =
    if (i < MaxCachedDim) cache((t * Bits + j) * MaxCachedDim + i)
    else rademacher(t, j, i)
}
