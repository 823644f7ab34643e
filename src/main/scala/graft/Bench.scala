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
  *
  * Regression triage (round 6): the min-of-two-orders statistic can still
  * be fooled by an outlier landing in BOTH orders (round 5's
  * rel_window_running_sum: 2.64/3.20 s in-suite, 0.71 s solo). So after the
  * two passes, any query whose min is ≥2× its PREVIOUS round's time (read
  * from SPARK_GRAFT_BENCH_PREV, default BENCH_PREV.json — a flat
  * {name: seconds} map the repo commits each round) gets an automatic
  * third, quiesced re-run: caches cleared, a full GC, then the query alone.
  * Those times land under "solo" — a real regression is slow there too; a
  * neighborhood artifact collapses back to baseline. Per-query GC time
  * (collector MXBean deltas, "gc1"/"gc2") is recorded for both passes so
  * ordering swings can be attributed to collection pressure rather than
  * guessed at.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark: SparkSession =
      GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query shuffle/aggregation spill attribution (the SpillProbe
    // counters, in-suite): a scale point whose wall clock moves with
    // partition count but whose plan is unchanged is memory-bound, not
    // plan-bound — the spill column is how the two are told apart.
    val memSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })
    val spillMb = new java.util.concurrent.ConcurrentHashMap[String, Double]()
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
      // Streaming residue: a finished streaming query (e.g. the AvailableNow
      // medallion run) leaves its RocksDB state-store providers cached in
      // the executor plus a maintenance thread pool — measured ~20-35% tax
      // on the batch queries that follow. Unload them; the next streaming
      // query reloads lazily. No-op when nothing is cached.
      scala.util.Try(
        org.apache.spark.sql.execution.streaming.state.StateStore.stop())
    }

    // Untimed warm-up against the measured dataset so JIT/codegen and file
    // listing don't land in the first query's measurement.
    names.headOption.foreach { n =>
      try { run(n); checkClean(n) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
    }
    // Contention probe: the same fixed CPU-bound job timed at run start,
    // between the two passes, and at run end. The work is constant, so any
    // drift measures the HOST (another tenant, thermal throttling), not the
    // engine — a run whose probes spread ≥1.5× is flagged "contended" so a
    // hosed pass is machine-detectable instead of inferred from uniform
    // query slowdowns (round 6 recorded one such ~2× run).
    // Deliberately NOT a Spark job: a Spark-side probe reads the engine's
    // own end-of-run state (GC debt, listener backlog, JIT re-tiering) as
    // "contention". A fixed multi-threaded integer spin measures only what
    // the HOST gives us: with all cores spinning, an oversubscribed host
    // (the thing the flag exists to catch) stretches wall time directly.
    @volatile var probeSink = 0L
    def probe(): Double = {
      System.gc() // keep collector pauses out of the spin
      val threads = math.max(1, cpus)
      val iters = 300000000L
      val t0 = System.nanoTime()
      val pool = (0 until threads).map { t =>
        new Thread(() => {
          var x = t.toLong; var i = 0L
          while (i < iters) { x ^= x * 2654435761L + (i >>> 13); i += 1 }
          probeSink ^= x
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }

    // Total JVM GC time so far, seconds — per-query deltas attribute slow
    // outliers to collection pressure (or rule it out).
    def gcSeconds(): Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum / 1e3
    }
    val twoPass = args.isEmpty
    def timedPass(order: Seq[String]): Map[String, (Double, Option[String], Double)] =
      order.map { name =>
        // Targeted profiling measures each query against a settled heap:
        // a heavy neighbor's collection debt otherwise lands in the next
        // query's wall clock (measured 3.8 → 25 s on llm_knn_ivf after
        // llm_dedup_minhash at sf10). Full two-pass runs keep the
        // historical in-suite measurement — min-of-two-orderings plus the
        // solo-rerun triage already absorb neighborhood effects there, and
        // a per-query full GC would break comparability with BENCH_PREV.
        if (!twoPass) System.gc()
        val g0 = gcSeconds()
        val s0 = memSpill.get + diskSpill.get
        val t0 = System.nanoTime()
        try {
          run(name)
          val t = (System.nanoTime() - t0) / 1e9
          val g = gcSeconds() - g0
          checkClean(name)
          // Listener delivery is async; checkClean's own actions give the
          // bus slack — attribution is approximate but MB-scale faithful.
          val s = (memSpill.get + diskSpill.get - s0) / 1e6
          spillMb.merge(name, s, (a, b) => math.max(a, b))
          name -> (t, None: Option[String], g)
        } catch {
          case e: Throwable =>
            checkClean(name)
            name -> (-1.0,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)),
              gcSeconds() - g0)
        }
      }.toMap

    // Pass 1 in the given (sorted) order; pass 2, full runs only, in a
    // seeded-shuffled order so each query sees different neighbors. Probes
    // bracket the passes (full runs only — targeted profiling stays lean).
    // Each probe point is the MIN of three consecutive runs: transient JVM
    // residue (JIT re-tiering, a concurrent GC cycle, listener backlog from
    // the preceding pass) recovers within a run or two, while genuine
    // external host load slows all three. The first point additionally
    // warms until two consecutive runs agree within 20% so the probe's own
    // codegen/JIT never lands in the measurement.
    def probeMin3(): Double = Seq(probe(), probe(), probe()).min
    val probeStart = if (twoPass) {
      var prev = probe()
      var cur = probe()
      var tries = 0
      while (tries < 4 && math.max(prev, cur) > 1.2 * math.min(prev, cur)) {
        prev = cur; cur = probe(); tries += 1
      }
      probeMin3()
    } else -1.0
    val pass1 = timedPass(names)
    val probeMid = if (twoPass) probeMin3() else -1.0
    val pass2: Map[String, (Double, Option[String], Double)] =
      if (!twoPass) Map.empty
      else {
        val seed = sys.env.getOrElse("SPARK_GRAFT_BENCH_SEED", "42").toLong
        timedPass(new scala.util.Random(seed).shuffle(names))
      }
    val probeEnd = if (twoPass) probeMin3() else -1.0
    val probes = Seq(probeStart, probeMid, probeEnd)
    // Asymmetric test: residual JIT tiering makes later probes FASTER than
    // the start (measured 0.126→0.084 over a clean run), so only a later
    // probe ≥1.5× the start indicates the host degraded mid-run. All three
    // values are emitted so start-contended runs remain human-visible.
    val contended = twoPass && math.max(probeMid, probeEnd) >= 1.5 * probeStart

    val results: Seq[(String, Double, Option[String])] = names.map { name =>
      val (t1, e1, _) = pass1(name)
      pass2.get(name) match {
        case Some((t2, e2, _)) =>
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

    // Regression triage: previous round's per-query minima (committed as
    // BENCH_PREV.json). Any ok query at ≥2× its previous time (and ≥0.3 s
    // absolute growth — sub-tenth-second queries double on scheduler noise
    // alone) gets a third, quiesced run: neighbors done, caches cleared,
    // full GC first. A real regression stays slow; suite interference
    // collapses to baseline.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "BENCH_PREV.json")
    val prev: Map[String, Double] =
      try {
        val f = Paths.get(prevPath)
        if (!Files.exists(f)) Map.empty
        else {
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          val node = om.readTree(Files.readString(f))
          import scala.jdk.CollectionConverters._
          node.properties().asScala
            .filter(_.getValue.isNumber)
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not read $prevPath: ${e.getMessage}")
          Map.empty
      }
    val solo: Map[String, Double] =
      if (!twoPass) Map.empty
      else results.collect {
        case (name, t, None)
            if prev.get(name).exists(p => p > 0 && t >= 2 * p && t - p >= 0.3) =>
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          val s = try { run(name); (System.nanoTime() - t0) / 1e9 }
            catch { case _: Throwable => -1.0 }
          checkClean(name)
          name -> s
      }.toMap

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
        val g1 = obj(names.map(n => n -> f"${pass1(n)._3}%.3f"))
        val g2 = obj(names.map(n => n -> f"${pass2(n)._3}%.3f"))
        val so = obj(solo.map { case (k, v) => k -> v.toString })
        val pr = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
        s""","passes":2,"pass1":$p1,"pass2":$p2,"unstable":$un,"leaks":$lk,"gc1":$g1,"gc2":$g2,"solo":$so,"probe":$pr,"contended":$contended,"prev_ref":${if (prev.isEmpty) "null" else "\"" + esc(prevPath) + "\""}"""
      }
    // Two renditions of the same result. stdout gets the COMPACT line —
    // headline figure, HEADLINE per-query minima, errors, contention flag.
    // The round driver keeps only a bounded tail (~2 KB) of captured
    // output: BENCH_r13's tail shows the all-query map (10+ KB) truncated
    // at its FRONT, which is what left "parsed": null three rounds
    // running. The compact line therefore carries only the ~11 headline
    // queries (≈0.7 KB — whole line fits the tail buffer); the full
    // per-query map, passes, gc, and solo diagnostics live in the on-disk
    // copy the "full" field points at.
    val pr = probes.map(p => f"$p%.3f").mkString("[", ",", "]")
    val sp = {
      import scala.jdk.CollectionConverters._
      obj(spillMb.asScala.toSeq.filter(_._2 >= 1.0).sortBy(_._1)
        .map { case (k, v) => k -> f"$v%.1f" })
    }
    val qsHead = obj(results.collect {
      case (k, v, _) if headline(k) => k -> f"$v%.3f" })
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","total_all":$totalAll,"n_queries":${results.size},"n_ok":${ok.size},"queries":$qsHead,"errors":$errs,"contended":$contended,"probe":$pr,"spill_mb":$sp,"full":"BENCH_LAST.json","sf":"${esc(sfDir)}"}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","total_all":$totalAll,"queries":$qs,"errors":$errs$extra,"spill_mb":$sp,"sf":"${esc(sfDir)}"}"""
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
    // Print AFTER spark.stop(): shutdown logging otherwise lands between
    // the JSON and sbt's [success] banner, pushing the line out of the
    // driver's bounded tail.
    spark.stop()
    println(compact)
    if (ok.size != results.size) sys.exit(1)
  }
}
