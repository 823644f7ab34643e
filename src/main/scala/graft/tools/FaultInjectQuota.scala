package graft.tools

import graft.streaming.QuotaStream

import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Executor-loss injection on the STREAMING QUOTA ADMISSION: the documents
  * corpus drains through QuotaStream in waves under local-cluster while
  * `kill -9` lands on executor JVMs mid-drain; afterwards the admitted set
  * must (a) respect every per-source cap and (b) be BIT-IDENTICAL to a
  * clean (kill-free) run over the same waves — retried stages and replayed
  * micro-batches re-derive the same hash-ordered prefix admission because
  * prior spend reads only earlier batches' persisted sums.
  *
  * One file per wave + maxFilesPerTrigger=1 pins the batch structure, so
  * faulted and clean runs decide over identical batch contents and any
  * divergence is a real recovery bug, not regrouping noise.
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInjectQuota <jar> <sfDir> [workDir]
  */
object FaultInjectQuota {
  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = if (args.length > 1) args(1) else "/tmp/graft_fault_quota"
    // Must BIND at the probe scale (sf0.1: ~25k tokens/source) or the
    // quota half of the claim is vacuous; the binding check below fails
    // the run if no source gets capped.
    val cap = if (args.length > 2) args(2).toLong else 10000L
    val spark = graft.GraftSession("graft-fault-quota")
    spark.sparkContext.setLogLevel("WARN")
    // A stale workdir (landing files + checkpoint + spent state from an
    // earlier invocation) would make this run process nothing and pass
    // vacuously — always start from a clean slate.
    val basePath = new org.apache.hadoop.fs.Path(base)
    basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(basePath, true)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    @volatile var kills = 0
    @volatile var taskFailures = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.reason != org.apache.spark.Success) taskFailures += 1
      })
    @volatile var disarm = false
    val killer = new Thread(() => {
      var fired = 0
      val deadline = System.nanoTime() + 180L * 1000000000L
      while (!disarm && fired < 2 && System.nanoTime() < deadline) {
        if (spark.streams.active.nonEmpty) {
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

    def runWaves(tag: String): org.apache.spark.sql.DataFrame = {
      val landing = s"$base/$tag/landing"
      (0 to 2).foreach { wave =>
        docs.filter(pmod(col("doc_id"), lit(3)) === wave)
          .coalesce(1).write.mode("append").parquet(landing)
        QuotaStream.start(spark, landing, s"$base/$tag/state",
          s"$base/$tag/cp", cap, maxFilesPerTrigger = 1).awaitTermination()
      }
      QuotaStream.admitted(spark, s"$base/$tag/state")
    }

    val faulted = runWaves("faulted").cache()
    faulted.count() // materialize before the kill window closes
    disarm = true
    killer.join(2000)
    val clean = runWaves("clean").cache()

    val spend = faulted.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t")).collect()
    val overspent = spend.filter(_.getLong(1) > cap).map(_.getString(0))
    // The cap must actually CONSTRAIN, not just not-be-exceeded: a source
    // is capped iff it admitted fewer docs than arrived for it. Every
    // source must be capped at the probe scale, or the quota half of the
    // evidence is vacuous and the run fails loudly.
    val arrived = docs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val admittedBySource = faulted.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val binding = arrived.count { case (src, n) =>
      admittedBySource.getOrElse(src, 0L) < n }
    val extra = faulted.select("doc_id").except(clean.select("doc_id")).count()
    val missing = clean.select("doc_id").except(faulted.select("doc_id")).count()
    val ok = overspent.isEmpty && binding == arrived.size &&
      extra == 0 && missing == 0 && kills > 0
    val row =
      s"""{"admitted":${faulted.count()},"clean_admitted":${clean.count()},""" +
        s""""sources":${spend.length},"overspent":${overspent.length},""" +
        s""""binding_sources":$binding,"cap":$cap,""" +
        s""""extra":$extra,"missing":$missing,"match":${extra == 0 && missing == 0},""" +
        s""""kills":$kills,"task_failures":$taskFailures}"""
    println(row)
    val out = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS_QUOTA.json")
    Files.writeString(Paths.get(out), row + "\n")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
