package graft

import graft.operators.BloomPrune
import org.apache.spark.sql.functions._

/** The runtime bloom pre-filter's contract: exact join results, zero
  * false negatives, a real row cut before the shuffle, and a plan where
  * the prune is a codegen'd filter under the fact-side Exchange (never a
  * join, UDF, or extra shuffle). */
class BloomJoinSpec extends SparkSpec {

  private def part = spark.read.parquet(s"$sfDir/part.parquet")
  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("pruned join result equals the plain join bit-for-bit") {
    val pruned = SparkEntry.queries("rel_bloom_join")(spark, sfDir)
      .collect().map(_.toString).sorted
    val dim = part.filter(col("p_size") === 1).select(col("p_partkey"))
    val plain = li
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"))
      .join(dim.hint("shuffle_hash"), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        graft.api.Exact.dsum(col("l_extendedprice") *
          (lit(1.0) - col("l_discount"))).as("revenue"))
      .collect().map(_.toString).sorted
    assert(pruned.toSeq === plain.toSeq)
  }

  test("no false negatives; survivors cut to dim selectivity + small FP") {
    val dim = part.filter(col("p_size") === 1).select(col("p_partkey"))
    val words = BloomPrune.buildWords(dim)
    val total = li.count()
    val trueMatch = li.join(dim, col("l_partkey") === col("p_partkey"),
      "left_semi").count()
    val survivors = li.filter(BloomPrune.mayContain(words, col("l_partkey")))
    // Every truly-matching row must survive the filter (no false negatives).
    assert(survivors.join(dim, col("l_partkey") === col("p_partkey"),
      "left_semi").count() === trueMatch)
    val nSurv = survivors.count()
    assert(nSurv >= trueMatch)
    // p_size=1 is ~2% of parts; 2^20 bits at this key count keeps FP well
    // under a few percent — a broken hash/bitmap degenerates to ~100%.
    assert(nSurv.toDouble / total < 0.2,
      s"prune kept $nSurv of $total rows — bitmap not selective")
  }

  test("plan: prune is a filter below the fact Exchange; no UDF, no extra shuffle") {
    val pruned = SparkEntry.queries("rel_bloom_join")(spark, sfDir)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("xxhash64"), "bloom probes missing from the plan")
    // Same exchange count as the unpruned spelling: the 128 KB bitmap
    // rides as a literal, not a join.
    val initial = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(initial).length
    assert(exchanges <= 3, // fact side, dim side, final aggregate
      s"bloom prune added exchanges ($exchanges):\n$initial")
  }
}
