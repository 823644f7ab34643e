package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs EVERY registered query (headline-only with
  * SPARK_GRAFT_BENCH_HEADLINE=1) against SPARK_GRAFT_SF_DIR and emits one
  * JSON line with per-query wall-clock seconds — so per-query regressions
  * are visible across the whole surface, not just the headline set. The
  * top-level "value" remains the HEADLINE total (the figure BASELINE.md
  * tracks across rounds); "total_all" is the all-query total.
  *
  * Failures are never reported as timings: a failed query records -1 and is
  * listed under "errors", and the process exits nonzero. The JSON line is
  * printed to stdout AND (because stdout is interleaved with sbt/log4j
  * noise) written to the file named by SPARK_GRAFT_BENCH_OUT when set.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession =
      GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.nonEmpty) args.toSeq // targeted profiling
      else if (sys.env.get("SPARK_GRAFT_BENCH_HEADLINE").contains("1"))
        SparkEntry.benchQueries
      else SparkEntry.queries.keys.toSeq.sorted
    // Execute the FULL plan: count() would let Catalyst prune the very
    // aggregates/projections being measured (and collapse pure projections
    // to a parquet metadata count). The noop sink runs everything and
    // discards the rows.
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Untimed warm-up against the measured dataset so JIT/codegen and file
    // listing don't land in the first query's measurement.
    names.headOption.foreach { n =>
      try run(n)
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
    }
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try {
        run(name)
        (name, (System.nanoTime() - t0) / 1e9, None: Option[String])
      } catch {
        case e: Throwable =>
          (name, -1.0, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
      }
    }
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val ok = results.filter(_._3.isEmpty)
    val qs = results.map { case (k, v, _) => "\"" + esc(k) + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      "\"" + esc(k) + "\":\"" + esc(m) + "\"" }.mkString("{", ",", "}")
    val headline = SparkEntry.benchQueries.toSet
    // "value" stays the headline-query total so the figure is comparable
    // to BASELINE.md and earlier rounds regardless of how many queries ran.
    val total = ok.filter(r => headline(r._1)).map(_._2).sum
    val totalAll = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","total_all":$totalAll,"queries":$qs,"errors":$errs,"sf":"${esc(sfDir)}"}"""
    // Always leave a machine-readable copy on disk: sbt prefixes forked
    // stdout with "[info] ", which broke JSON-line scraping in the past.
    // EXCEPT for targeted profiling runs (explicit query args) without an
    // explicit out path — those would clobber BENCH_LAST.json's tracked
    // headline figure with a partial (usually 0) subtotal.
    val out = sys.env.get("SPARK_GRAFT_BENCH_OUT")
      .orElse(if (args.isEmpty) Some("BENCH_LAST.json") else None)
    out.foreach { o =>
      try Files.writeString(Paths.get(o), json + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $o: ${e.getMessage}")
      }
    }
    println(json)
    spark.stop()
    if (ok.size != results.size) sys.exit(1)
  }
}
