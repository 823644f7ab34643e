package graft.tools

import graft.streaming.HeavyHitterStream

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executor-loss injection on the STREAMING HEAVY-HITTER sketch: the same
  * document waves drain through two independent HeavyHitterStream
  * instances under local-cluster — run A clean, run B with `kill -9`
  * landing on executor JVMs mid-drain — and the final summaries must be
  * BIT-IDENTICAL: each batch is a deterministic file set (checkpointed
  * source, fixed admission cap), each partition summary is a pure function of
  * its file split, and the merge reads the predecessor's `batch=<id>` dir
  * and overwrites its own, so a retried/replayed attempt re-derives the
  * same state regardless of which attempt survived. The MG bounds are
  * additionally validated against exact token recounts (the
  * HeavyHitterStreamSpec guarantees, now under real executor death).
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInjectHH <jar> <sfDir> [workDir]
  */
object FaultInjectHH {
  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = if (args.length > 1) args(1) else "/tmp/graft_fault_hh"
    // Below the fixture's ~31-term vocabulary, so the sketch genuinely
    // EVICTS (d > 0) and the merge's subtract-v reduction runs under the
    // injected kills — m above the vocab would make the fold trivially
    // exact and the injection vacuous for the MG machinery.
    val m = 16
    val spark = graft.GraftSession("graft-fault-hh")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    @volatile var killing = false
    @volatile var kills = 0
    @volatile var taskFailures = 0
    @volatile var executorsRemoved = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.reason != org.apache.spark.Success) taskFailures += 1
        override def onExecutorRemoved(
            e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit =
          executorsRemoved += 1
      })
    val killer = new Thread(() => {
      var fired = 0
      val deadline = System.nanoTime() + 240L * 1000000000L
      while (fired < 2 && System.nanoTime() < deadline) {
        if (killing && spark.streams.active.nonEmpty) {
          executorPids().headOption.foreach { pid =>
            Seq("kill", "-9", pid.toString).!
            fired += 1; kills += 1
          }
          Thread.sleep(5000)
        } else Thread.sleep(50)
      }
    })
    killer.setDaemon(true)
    killer.start()

    // Identical wave sequence into both landings; A drains clean, B drains
    // with the killer armed.
    (0 to 2).foreach { wave =>
      val slice = docs.filter(pmod(col("doc_id"), lit(3)) === wave).coalesce(4)
      Seq("A", "B").foreach(t =>
        slice.write.mode("append").parquet(s"$base/$t/landing"))
      HeavyHitterStream.runAvailableNow(spark, s"$base/A/landing",
        s"$base/A/state", s"$base/A/cp", m, maxFilesPerTrigger = 1)
      killing = true
      HeavyHitterStream.runAvailableNow(spark, s"$base/B/landing",
        s"$base/B/state", s"$base/B/cp", m, maxFilesPerTrigger = 1)
      killing = false
    }

    def lastBatch(t: String): Long =
      new java.io.File(s"$base/$t/state/summary").listFiles()
        .map(_.getName).filter(_.startsWith("batch="))
        .map(_.stripPrefix("batch=").toLong).max
    def summary(t: String): (Seq[(String, Long)], (Long, Long)) = {
      val b = lastBatch(t)
      val c = spark.read.parquet(s"$base/$t/state/summary/batch=$b/counters")
        .as[(String, Long)].collect().sorted.toSeq
      val meta = spark.read.parquet(s"$base/$t/state/summary/batch=$b/meta")
        .select("d", "n").as[(Long, Long)].collect().head
      (c, meta)
    }
    val (ca, (da, na)) = summary("A")
    val (cb, (db, nb)) = summary("B")
    val identical = ca == cb && da == db && na == nb

    // Bounds vs exact recounts (guarantees must hold in BOTH runs).
    val exact = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val boundsOk = cb.forall { case (t, c) =>
      val e = exact.getOrElse(t, 0L); c <= e && e <= c + db
    }
    val guaranteeOk = db <= n / (m + 1) && nb == n &&
      exact.filter(_._2 > db).keys.forall(t => cb.exists(_._1 == t))

    // The injection must have DISRUPTED execution, not just signalled a
    // drained executor: require the scheduler to have observed a removal
    // (or a task death) between kill and verdict.
    val landed = kills >= 2 && (executorsRemoved >= 1 || taskFailures >= 1)
    val ok = identical && boundsOk && guaranteeOk && landed
    val row =
      s"""{"tracked":${cb.size},"identical":$identical,"bounds_ok":$boundsOk,""" +
      s""""guarantee_ok":$guaranteeOk,"d":$db,"n":$nb,"kills":$kills,""" +
      s""""task_failures":$taskFailures,"executors_removed":$executorsRemoved,""" +
      s""""match":$ok}"""
    println(row)
    val out = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS_HH.json")
    Files.writeString(Paths.get(out), row + "\n")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
