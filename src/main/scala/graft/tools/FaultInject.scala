package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration._
import scala.concurrent.{Await, Future, ExecutionContext}
import scala.sys.process._

/** Executor-loss fault injection: the "survives a dead executor" claim,
  * exercised instead of asserted.
  *
  * Every scale argument so far (reliable checkpoints for label propagation,
  * retryable shuffle stages, deterministic task re-execution) has been made
  * from plan shape. This main runs each named query twice under a REAL
  * multi-process master (`spark-submit --master local-cluster[2,C,M]`, two
  * executor JVMs): once clean, once with a `kill -9` delivered to one
  * executor process mid-query. It then proves three things per query:
  *
  *   1. the faulted run still completes (Spark relaunches the executor via
  *      the standalone worker, re-runs lost tasks, and regenerates lost
  *      shuffle output by stage resubmission);
  *   2. the faulted result is BIT-IDENTICAL to the clean result (order-
  *      independent SHA-256 over canonicalized rows) — recovery is not
  *      "close enough", it is exact, because every operator in the engine
  *      is a deterministic function of its input partitions;
  *   3. the kill actually landed mid-flight: the tool requires at least one
  *      task failure or executor-removal event between query start and end,
  *      otherwise it reports the injection as a MISS (e.g. the query
  *      finished before the kill) rather than claiming a vacuous pass.
  *
  * Output: one JSON line per query plus a summary file (FAULTS.json by
  * default; override with SPARK_GRAFT_FAULT_OUT).
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInject <jar> <sfDir> <query> [query ...]
  *
  * Intentionally NOT a ScalaTest: local-cluster needs a packaged jar on the
  * executor classpath, which an sbt test JVM does not provide.
  */
object FaultInject {
  /** Order-independent canonical hash of a result: rows rendered with
    * columns in name order, row-strings sorted, SHA-256 over the block.
    */
  private def resultHash(spark: SparkSession, name: String, sfDir: String): (String, Long) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val cols = df.columns.sorted
    val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
    val lines = rows.map(_.toSeq.map(v => String.valueOf(v)).mkString("\u0001")).sorted
    val d = MessageDigest.getInstance("SHA-256")
    lines.foreach(l => d.update((l + "\n").getBytes("UTF-8")))
    (d.digest().map("%02x".format(_)).mkString, rows.length.toLong)
  }

  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: FaultInject <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession("graft-fault") // master comes from spark-submit
    val tracker = spark.sparkContext.statusTracker

    val taskFailures = new AtomicInteger(0)
    val executorsRemoved = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.reason != org.apache.spark.Success) taskFailures.incrementAndGet()
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        executorsRemoved.incrementAndGet()
    })

    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = names.map { name =>
      // Clean reference pass (also warms code paths so the timing of the
      // faulted pass is not the first-touch one).
      val t0 = System.nanoTime()
      val (cleanHash, cleanRows) = resultHash(spark, name, sfDir)
      val cleanSec = (System.nanoTime() - t0) / 1e9

      val beforePids = executorPids()
      val f0 = taskFailures.get(); val x0 = executorsRemoved.get()
      val t1 = System.nanoTime()
      val fut = Future { resultHash(spark, name, sfDir) }
      // Wait until the query is genuinely running, then let it get partway
      // (a third of the clean wall time) before pulling the trigger — a
      // kill during the first scan and a kill mid-shuffle both land in this
      // window across the query set.
      var waited = 0
      while (tracker.getActiveStageIds.isEmpty && !fut.isCompleted && waited < 20000) {
        Thread.sleep(20); waited += 20
      }
      Thread.sleep(math.max(100L, (cleanSec * 1000 / 3).toLong))
      val victim = executorPids().headOption
      val killedMidFlight = victim.isDefined && !fut.isCompleted
      victim.foreach(pid => Seq("kill", "-9", pid.toString).!)
      val (faultHash, faultRows) = Await.result(fut, 15.minutes)
      val faultSec = (System.nanoTime() - t1) / 1e9
      // Give the standalone worker a beat to relaunch the executor, so the
      // next query starts with full capacity (and so recovery is visible).
      var regained = executorPids()
      var tries = 0
      while (regained.size < beforePids.size && tries < 100) {
        Thread.sleep(200); regained = executorPids(); tries += 1
      }
      val failures = taskFailures.get() - f0
      val removed = executorsRemoved.get() - x0
      val landed = killedMidFlight && (failures > 0 || removed > 0)
      val json =
        s"""{"query":"$name","rows":$cleanRows,"match":${cleanHash == faultHash && cleanRows == faultRows},""" +
          s""""injection_landed":$landed,"task_failures":$failures,"executors_removed":$removed,""" +
          s""""clean_sec":${"%.2f".format(cleanSec)},"faulted_sec":${"%.2f".format(faultSec)},""" +
          s""""executors_before":${beforePids.size},"executors_after":${regained.size},""" +
          s""""victim_pid":${victim.getOrElse(-1)}}"""
      println(json)
      json
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS.json")
    Files.writeString(Paths.get(out), results.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
