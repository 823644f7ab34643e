package graft.tools

import graft.GraftSession
import graft.operators.BloomPrune
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Pruned-vs-unpruned evidence for the runtime bloom join filter: times
  * the same shuffle-hash fact⋈dim aggregate with and without the
  * [[BloomPrune]] scan pre-filter and reports the fact rows that reached
  * the shuffle either way. Prints one JSON line (→ BLOOM_JOIN_sf10.json).
  *
  * Usage: runMain graft.tools.BloomJoinBench <sfDir>
  */
object BloomJoinBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.builder("graft-bloom-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = Tables.load(spark, dir, "part")
      .filter($"p_size" === 1).select($"p_partkey")
    def fact = Tables.load(spark, dir, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_discount", $"l_returnflag")
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim.hint("shuffle_hash"), $"l_partkey" === $"p_partkey")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          graft.api.Exact.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .as("revenue"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        timed(df.write.format("noop").mode("overwrite").save())._2
      }.min

    val (words, buildSec) = timed(BloomPrune.buildWords(dim))
    val pruned = agg(fact.filter(BloomPrune.mayContain(words, $"l_partkey")))
    val plain = agg(fact)

    val tPruned = run(pruned)
    val tPlain = run(plain)
    val totalRows = fact.count()
    val shuffledRows = fact.filter(BloomPrune.mayContain(words, $"l_partkey")).count()
    val matchRows = fact.join(dim, $"l_partkey" === $"p_partkey", "left_semi").count()

    // scalastyle:off println
    println(s"""{"metric":"bloom_join","sf":"$dir","build_sketch_sec":$buildSec,""" +
      s""""pruned_sec":$tPruned,"unpruned_sec":$tPlain,""" +
      s""""fact_rows":$totalRows,"rows_into_shuffle_pruned":$shuffledRows,""" +
      s""""true_match_rows":$matchRows,""" +
      s""""shuffle_row_cut":${totalRows.toDouble / shuffledRows}}""")
    // scalastyle:on println
    spark.stop()
  }
}
