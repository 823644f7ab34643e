package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: `minhash_sig(array<string>) → array<bigint>`,
  * the 128-permutation MinHash signature of a shingle set.
  *
  * Why a custom expression (the one place built-ins genuinely fall short):
  * the same computation composed from built-ins either (a) nests
  * higher-order lambdas, which Spark evaluates interpreted — an order of
  * magnitude slower per row — or (b) explodes every (shingle × permutation)
  * pair into 128× rows through a join + re-aggregation shuffle. This
  * expression does one tight loop per row inside whole-stage codegen: hash
  * each shingle once (XXH64, Spark's own hash kernel), then fold the 128
  * seeded re-hashes with a running min. No extra rows, no shuffle, no
  * boxing.
  *
  * The permutation family is `xxh64(xxh64(shingle, 42), p)` — identical to
  * what the built-in `xxhash64(xxhash64(shingle), p)` pipeline produced, so
  * signatures are stable across the implementations.
  */
case class MinHashSig(child: Expression, numPerms: Int = 128)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var p = 0
      while (p < numPerms) {
        val hp = XXH64.hashLong(h, p.toLong)
        if (hp < sig(p)) sig(p) = hp
        p += 1
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = classOf[XXH64].getName
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val hp = ctx.freshName("hp")
      s"""
        long[] $sig = new long[$numPerms];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $i = 0; $i < $c.numElements(); $i++) {
          long $h = $xxh.hashUTF8String($c.getUTF8String($i), 42L);
          for (int $p = 0; $p < $numPerms; $p++) {
            long $hp = $xxh.hashLong($h, (long) $p);
            if ($hp < $sig[$p]) $sig[$p] = $hp;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($sig);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Engine function registry: injectable via [[GraftExtensions]]
  * (`SparkSessionExtensions`, the library-user path) or registered directly
  * on an existing session (the path the query registry uses, so any plain
  * session works). */
object GraftFunctions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSig].getCanonicalName, "minhash_sig"),
        // 1-arg: default 128 perms. 2-arg: minhash_sig(sh, numPerms) — the
        // permutation family is indexed per-perm, so a longer signature is a
        // superset (identical prefix) of a shorter one.
        (children: Seq[Expression]) => children match {
          case Seq(c) => MinHashSig(c)
          case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(n, _)) =>
            MinHashSig(c, n.toString.toInt)
          case _ => throw new IllegalArgumentException(
            "minhash_sig(array<string>[, numPerms literal])")
        }),
      (FunctionIdentifier("hyperplane_codes"),
        new ExpressionInfo(classOf[HyperplaneCodes].getCanonicalName, "hyperplane_codes"),
        (children: Seq[Expression]) => HyperplaneCodes(children.head)),
      (FunctionIdentifier("vec_cosine"),
        new ExpressionInfo(classOf[VecCosine].getCanonicalName, "vec_cosine"),
        (children: Seq[Expression]) => VecCosine(children(0), children(1))),
      (FunctionIdentifier("poly_fingerprint"),
        new ExpressionInfo(classOf[PolyFingerprint].getCanonicalName, "poly_fingerprint"),
        (children: Seq[Expression]) => PolyFingerprint(children.head)),
      (FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getCanonicalName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head)),
      (FunctionIdentifier("md5_long"),
        new ExpressionInfo(classOf[Md5Long].getCanonicalName, "md5_long"),
        (children: Seq[Expression]) => Md5Long(children.head)),
      (FunctionIdentifier("simhash_md5"),
        new ExpressionInfo(classOf[SimHashMd5].getCanonicalName, "simhash_md5"),
        (children: Seq[Expression]) => SimHashMd5(children.head)),
      (FunctionIdentifier("hyperplane_codes_md5"),
        new ExpressionInfo(classOf[HyperplaneCodesMd5].getCanonicalName, "hyperplane_codes_md5"),
        (children: Seq[Expression]) => HyperplaneCodesMd5(children.head)),
      (FunctionIdentifier("cdc_chunks"),
        new ExpressionInfo(classOf[CdcChunks].getCanonicalName, "cdc_chunks"),
        (children: Seq[Expression]) => CdcChunks(children.head)),
      (FunctionIdentifier("token_windows"),
        new ExpressionInfo(classOf[TokenWindows].getCanonicalName, "token_windows"),
        (children: Seq[Expression]) =>
          TokenWindows(children(0), children(1), children(2))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `SparkSession.builder.withExtensions(new GraftExtensions)` — or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(extensions.injectFunction)
    // Constraint-aware optimizations Spark can't do without declared
    // PK/FK metadata (see graft.plans.JoinElimination).
    extensions.injectOptimizerRule(graft.plans.EliminatePkFkJoin)
    // Automatic data skipping: point-predicate scans over tables
    // registered with SkippingIndex.enableAutoPrune read only candidate
    // files (see graft.plans.ConsultSkippingIndex).
    extensions.injectOptimizerRule(graft.plans.ConsultSkippingIndex)
    // Materialized-view rollup rewrite: subsumed aggregates over a
    // registered fact table re-point at its partial-aggregate rollup
    // (see graft.plans.MaterializedView).
    extensions.injectOptimizerRule(graft.plans.RewriteToMv)
    // Whole-operator extension: native sort-merge as-of join
    // (see graft.plans.AsofJoin).
    extensions.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
