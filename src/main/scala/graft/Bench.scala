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
  * Outlier discipline: a single-JVM 133-query run shares JIT, GC, and page
  * cache across queries, and one GC pause can land a 5× outlier on an
  * unchanged query (round 4's rel_agg_grouping_sets: 5.04 s in-suite,
  * 1.08 s solo). Full runs therefore execute TWO timed passes in different
  * orders (sorted, then seeded-shuffled) and report the per-query MIN —
  * the minimum over orderings is the statistic least contaminated by
  * neighbors. Both raw passes and any query whose two times differ by
  * >30% ("unstable") are emitted so a real regression (slow in BOTH
  * orders) is distinguishable from scheduling noise (slow in one).
  *
  * Leak detection: after every query the harness asserts the session is
  * clean — no cached plans left behind, no streaming query still running.
  * A query that leaks either would tax every neighbor that follows (the
  * round-3 rel_agg_stats episode was exactly a leaked cache); leakers are
  * reported by name under "leaks" and the residue is cleared so one
  * offender cannot poison the rest of the measurement.
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

    // Post-query hygiene: report (and clear) anything the query left
    // behind that would interfere with subsequent measurements.
    val leaks = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def checkClean(name: String): Unit = {
      if (!spark.sharedState.cacheManager.isEmpty) {
        leaks.getOrElseUpdate(name, "cached plan not released")
        spark.sharedState.cacheManager.clearCache()
      }
      if (spark.streams.active.nonEmpty) {
        leaks.getOrElseUpdate(name, "streaming query left running")
        spark.streams.active.foreach(q => scala.util.Try(q.stop()))
      }
    }

    // Untimed warm-up against the measured dataset so JIT/codegen and file
    // listing don't land in the first query's measurement.
    names.headOption.foreach { n =>
      try { run(n); checkClean(n) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
    }
    def timedPass(order: Seq[String]): Map[String, (Double, Option[String])] =
      order.map { name =>
        val t0 = System.nanoTime()
        try {
          run(name)
          val t = (System.nanoTime() - t0) / 1e9
          checkClean(name)
          name -> (t, None: Option[String])
        } catch {
          case e: Throwable =>
            checkClean(name)
            name -> (-1.0, Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }.toMap

    // Pass 1 in the given (sorted) order; pass 2, full runs only, in a
    // seeded-shuffled order so each query sees different neighbors.
    val pass1 = timedPass(names)
    val twoPass = args.isEmpty
    val pass2: Map[String, (Double, Option[String])] =
      if (!twoPass) Map.empty
      else {
        val seed = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEED", "42").toLong
        timedPass(new scala.util.Random(seed).shuffle(names))
      }

    val results: Seq[(String, Double, Option[String])] = names.map { name =>
      val (t1, e1) = pass1(name)
      pass2.get(name) match {
        case Some((t2, e2)) =>
          // A query must succeed in BOTH passes to count as ok.
          val err = e1.orElse(e2)
          val t = if (err.isDefined) -1.0 else math.min(t1, t2)
          (name, t, err)
        case None => (name, t1, e1)
      }
    }
    val unstable = if (!twoPass) Seq.empty[(String, Double, Double)]
      else names.flatMap { name =>
        val t1 = pass1(name)._1
        val t2 = pass2(name)._1
        if (t1 > 0 && t2 > 0 && math.max(t1, t2) > 1.3 * math.min(t1, t2))
          Some((name, t1, t2))
        else None
      }

    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    def obj(entries: Iterable[(String, String)]): String =
      entries.map { case (k, v) => "\"" + esc(k) + "\":" + v }
        .mkString("{", ",", "}")
    val ok = results.filter(_._3.isEmpty)
    val qs = obj(results.map { case (k, v, _) => k -> v.toString })
    val errs = obj(results.collect { case (k, _, Some(m)) =>
      k -> ("\"" + esc(m) + "\"") })
    val headline = SparkEntry.benchQueries.toSet
    // "value" stays the headline-query total so the figure is comparable
    // to BASELINE.md and earlier rounds regardless of how many queries ran.
    val total = ok.filter(r => headline(r._1)).map(_._2).sum
    val totalAll = ok.map(_._2).sum
    val extra =
      if (!twoPass) ""
      else {
        val p1 = obj(names.map(n => n -> pass1(n)._1.toString))
        val p2 = obj(names.map(n => n -> pass2(n)._1.toString))
        val un = obj(unstable.map { case (n, t1, t2) =>
          n -> s"[$t1,$t2]" })
        val lk = obj(leaks.map { case (k, v) => k -> ("\"" + esc(v) + "\"") })
        s""","passes":2,"pass1":$p1,"pass2":$p2,"unstable":$un,"leaks":$lk"""
      }
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","total_all":$totalAll,"queries":$qs,"errors":$errs$extra,"sf":"${esc(sfDir)}"}"""
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
