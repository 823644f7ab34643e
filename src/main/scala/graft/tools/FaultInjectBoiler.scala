package graft.tools

import graft.llm.WebCuration
import graft.streaming.BoilerplateStream

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executor-loss injection on the STREAMING BOILERPLATE detector: the
  * planted-footer corpus drains through BoilerplateStream in waves under
  * local-cluster while `kill -9` lands on executor JVMs mid-drain, and the
  * emitted ban list must STILL equal the batch
  * [[WebCuration.bannedLines]] definition with every line emitted exactly
  * once — the flatMapGroupsWithState emitted-flag's exactly-once claim,
  * now under real executor death (state-store recovery + sink commit log
  * doing the work the spec only exercises via restarts).
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInjectBoiler <jar> <sfDir> [workDir]
  */
object FaultInjectBoiler {
  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = if (args.length > 1) args(1) else "/tmp/graft_fault_boiler"
    val spark = graft.GraftSession("graft-fault-boiler")
    spark.sparkContext.setLogLevel("WARN")
    val landing = s"$base/landing"
    val out = s"$base/out"
    val cp = s"$base/cp"

    val lined = WebCuration.linedDocs(spark, sfDir)
      .select("doc_id", "aug").cache()

    @volatile var kills = 0
    @volatile var taskFailures = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.reason != org.apache.spark.Success) taskFailures += 1
      })
    val killer = new Thread(() => {
      var fired = 0
      val deadline = System.nanoTime() + 180L * 1000000000L
      while (fired < 2 && System.nanoTime() < deadline) {
        if (spark.streams.active.nonEmpty) {
          executorPids().headOption.foreach { pid =>
            Seq("kill", "-9", pid.toString).!
            fired += 1; kills += 1
          }
          Thread.sleep(6000)
        } else Thread.sleep(50)
      }
    })
    killer.setDaemon(true)
    killer.start()

    (0 to 2).foreach { wave =>
      lined.filter(pmod(col("doc_id"), lit(3)) === wave)
        .coalesce(4).write.mode("append").parquet(landing)
      BoilerplateStream.runAvailableNow(spark, landing, out, cp,
        minDocs = 3, maxFilesPerTrigger = 1)
    }
    killer.join(1000)

    val streamed = BoilerplateStream.bannedSet(spark, out).cache()
    val batch = WebCuration.bannedLines(
      WebCuration.explodedLines(lined), minDocs = 3).cache()
    val nStream = streamed.count()
    val nDistinct = streamed.select("line").distinct().count()
    val extra = streamed.select("line").except(batch).count()
    val missing = batch.except(streamed.select("line")).count()
    val ok = extra == 0 && missing == 0 && nStream == nDistinct
    val row =
      s"""{"banned":$nStream,"batch_banned":${batch.count()},"duplicates":${nStream - nDistinct},"extra":$extra,"missing":$missing,"match":$ok,"kills":$kills,"task_failures":$taskFailures}"""
    println(row)
    val outFile = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS_BOILER.json")
    Files.writeString(Paths.get(outFile), row + "\n")
    spark.stop()
    if (!ok || kills == 0) sys.exit(1)
  }
}
