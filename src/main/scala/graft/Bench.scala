package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries (SparkEntry.benchQueries, or
  * all queries when SPARK_GRAFT_BENCH_ALL=1) against SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall-clock seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession =
      GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries.keys.toSeq.sorted
      else SparkEntry.benchQueries
    // One untimed warm-up action so JIT/codegen + file listing don't land
    // in the first query's measurement.
    SparkEntry.entry(spark).count()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
