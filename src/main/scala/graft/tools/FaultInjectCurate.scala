package graft.tools

import graft.llm.Dedup
import graft.streaming.CurateStream

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executor-loss injection on the STREAMING CURATION pipeline: the
  * documents corpus drains through CurateStream in waves under
  * local-cluster while `kill -9` lands on executor JVMs mid-drain, and the
  * resulting keep set must STILL equal the from-scratch batch dedup — the
  * CurateStreamSpec equality, now under real executor death. The retried
  * micro-batches re-run `applyBatch`, whose `batch=<id>` overwrites make
  * the replay exactly-once, so the accumulated pair/doc state is
  * unaffected by which attempt survived.
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInjectCurate <jar> <sfDir> [workDir]
  */
object FaultInjectCurate {
  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = if (args.length > 1) args(1) else "/tmp/graft_fault_curate"
    val spark = graft.GraftSession("graft-fault-curate")
    spark.sparkContext.setLogLevel("WARN")
    val landing = s"$base/landing"
    val state = s"$base/state"
    val cp = s"$base/cp"

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))

    // Killer: two executor kills while a streaming query is active.
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

    val gate = CurateStream.GateConfig(
      langs = Seq("en", "fr", "es"), minChars = 100, maxChars = 500)
    (0 to 2).foreach { wave =>
      docs.filter(pmod(col("doc_id"), lit(3)) === wave)
        .coalesce(4).write.mode("append").parquet(landing)
      CurateStream.runAvailableNow(spark, landing, state, cp, gate,
        maxFilesPerTrigger = 1)
    }
    killer.join(1000)

    val streamKeep = CurateStream.survivors(spark, state).cache()
    val gated = docs
      .filter(col("lang").isin("en", "fr", "es") &&
        col("n_chars").between(100, 500))
      .select(col("doc_id"), lower(col("text")).as("text"))
    val batchKeep = Dedup.keepSet(gated, Dedup.minhashPairs(gated)).cache()
    val extra = streamKeep.except(batchKeep).count()
    val missing = batchKeep.except(streamKeep).count()
    val n = streamKeep.count()
    val ok = extra == 0 && missing == 0
    val row =
      s"""{"survivors":$n,"batch_survivors":${batchKeep.count()},"extra":$extra,"missing":$missing,"match":$ok,"kills":$kills,"task_failures":$taskFailures}"""
    println(row)
    val out = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS_CURATE.json")
    Files.writeString(Paths.get(out), row + "\n")
    spark.stop()
    if (!ok || kills == 0) sys.exit(1)
  }
}
