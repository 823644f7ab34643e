package graft.tools

import graft.GraftSession
import graft.streaming.{ActivityGenerator, Medallion}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Exactly-once under executor loss, exercised on the LIVE medallion
  * pipeline rather than argued from the file-sink commit-log design.
  *
  * Two identical raw inputs (same generator seed) drain through two
  * independent medallion trees in the same local-cluster session: the first
  * cleanly, the second with `kill -9` delivered to an executor JVM while
  * the drain is in flight (and again a few seconds later, so more than one
  * micro-batch sees a death). The claim under test is the strongest one the
  * design makes: after executor loss mid-batch, every layer of the faulted
  * tree is BIT-IDENTICAL to the clean tree —
  *
  *   - bronze/quarantine: the file sink's `_spark_metadata` commit log
  *     means a batch re-run after a mid-write death publishes exactly its
  *     committed files; orphan parts from the dead attempt are invisible to
  *     readers;
  *   - silver: `dropDuplicatesWithinWatermark` state lives in RocksDB under
  *     the checkpoint — a retried batch reloads the last committed state
  *     version, so a replayed input row still dedups to exactly one output;
  *   - gold: the foreachBatch overwrite re-reads silver through its
  *     metadata log and is idempotent across retries.
  *
  * The quarantine comparison drops `processing_time` (a wall-clock audit
  * column, different on every run by construction); everything else is
  * compared in full.
  *
  * Usage:
  *   spark-submit --master local-cluster[2,8,8192] \
  *     --conf spark.executor.memory=6g \
  *     --class graft.tools.FaultInjectStream <jar> <workDir> [numFiles rowsPerFile]
  */
object FaultInjectStream {
  private def executorPids(): Set[Int] =
    ExecutorKill.executorPidsForThisApp()

  /** Order-independent digest of a layer (sum of per-row 64-bit hashes and
    * the row count — computed in Spark, so layers never hit the driver).
    */
  private def layerDigest(spark: SparkSession, dir: String, drop: Seq[String] = Nil): (BigDecimal, Long) = {
    val df0 = spark.read.parquet(dir) // honors _spark_metadata when present
    val df = drop.foldLeft(df0)(_.drop(_))
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    // Decimal sum: a 64-bit hash sum overflows Long under ANSI semantics.
    val row = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum(col("h")).as("hsum"), count(lit(1)).as("n"))
      .collect()(0)
    (BigDecimal(row.getDecimal(0)), row.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_fault_stream")
    val numFiles = if (args.length > 1) args(1).toInt else 24
    val rowsPerFile = if (args.length > 2) args(2).toInt else 8000
    val spark = GraftSession("graft-fault-stream")
    val clean = Medallion.Dirs(s"$base/clean")
    val faulted = Medallion.Dirs(s"$base/faulted")
    ActivityGenerator.generate(clean.raw, numFiles = numFiles, rowsPerFile = rowsPerFile, seed = 7L)
    ActivityGenerator.generate(faulted.raw, numFiles = numFiles, rowsPerFile = rowsPerFile, seed = 7L)

    Medallion.runAvailableNow(spark, clean, timeoutMs = 600000L)

    // Killer: two kills, the first as soon as a stream reports activity,
    // the second 6 s later — with bronze capped at 10 files/trigger the
    // drain spans multiple micro-batches, so the deaths land mid-batch in
    // different stages of the tree on different runs. Each kill is only
    // counted if at least one streaming query was active when it fired.
    @volatile var kills = 0
    val killer = new Thread(() => {
      var fired = 0
      val deadline = System.nanoTime() + 120L * 1000000000L
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
    Medallion.runAvailableNow(spark, faulted, timeoutMs = 600000L)
    killer.join(1000)

    val layers = Seq(
      ("bronze", Nil),
      ("quarantine", Seq("processing_time")),
      ("silver", Nil),
      ("gold", Nil))
    val rows = layers.map { case (layer, dropCols) =>
      def dirOf(d: Medallion.Dirs) = layer match {
        case "bronze" => d.bronze
        case "quarantine" => d.quarantine
        case "silver" => d.silver
        case "gold" => d.gold
      }
      val (ch, cn) = layerDigest(spark, dirOf(clean), dropCols)
      val (fh, fn) = layerDigest(spark, dirOf(faulted), dropCols)
      val ok = ch == fh && cn == fn
      s"""{"layer":"$layer","rows":$cn,"faulted_rows":$fn,"match":$ok,"kills":$kills}"""
    }
    rows.foreach(println)
    val out = sys.env.getOrElse("SPARK_GRAFT_FAULT_OUT", "FAULTS_STREAM.json")
    Files.writeString(Paths.get(out), rows.mkString("[", ",\n", "]\n"))
    spark.stop()
  }
}
