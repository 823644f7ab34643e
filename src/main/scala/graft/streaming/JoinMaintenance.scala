package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental view maintenance for a JOIN — the missing sibling of
  * [[Medallion.startGoldIncremental]]'s aggregate maintenance: keep
  * `V = A ⋈ B` current while BOTH sides grow, without ever recomputing the
  * full join (SURVEY §2.8 T9's layer-maintenance family; the reference
  * recomputes gold per trigger, `03_gold_layer_aggregation.py:35-42` — this
  * is the declared 100 TB form for join-shaped views).
  *
  * Per wave with increments ΔA and ΔB, the new pairs are exactly
  * `ΔA ⋈ B_prev  ∪  (A_prev ∪ ΔA) ⋈ ΔB` — i.e. ΔA×B_prev, A_prev×ΔB and
  * ΔA×ΔB, each counted once — so the view is maintained by appending that
  * delta-join, never touching existing V rows. Work per wave scales with
  * `|Δ| ⋈ accumulated`, not `|A ⋈ B|`: the delta side is typically
  * broadcastable (AQE picks that up from its size), and at full scale the
  * accumulated sides are stored partitioned by the join key so the
  * delta-join prunes to matching partitions (the same operational form as
  * `Dedup.incrementPairs`' persisted band index).
  *
  * Crash-safety / exactly-once: every wave writes ONLY under
  * `…/batch=<id>` subdirectories, each with mode=overwrite — a retried or
  * half-written wave overwrites its own subdirectories and re-derives its
  * view delta from strictly-older batches, so replaying a wave is
  * idempotent (the discipline `startGoldIncremental` uses for its state
  * versions). Readers see the view as the union of completed batch dirs.
  */
object JoinMaintenance {

  /** Layout of one maintained join view. */
  final case class View(base: String) {
    def aDir: String = s"$base/a"
    def bDir: String = s"$base/b"
    def vDir: String = s"$base/v"
  }

  private def batchDirs(spark: SparkSession, dir: String, below: Long): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(n => n.stripPrefix("batch=").toLong)
      .filter(_ < below).sorted
      .map(id => s"$dir/batch=$id")
  }

  private def readBatches(
      spark: SparkSession, dir: String, below: Long,
      template: DataFrame): DataFrame = {
    val dirs = batchDirs(spark, dir, below)
    if (dirs.isEmpty) template.limit(0)
    else spark.read.schema(template.schema).parquet(dirs: _*)
  }

  /** Apply one wave of increments. `keys` are the equi-join columns (same
    * names on both sides, as with `Dataset.join(right, usingColumns)`).
    * Re-running a wave with the same `batchId` is idempotent. */
  def step(
      spark: SparkSession,
      view: View,
      batchId: Long,
      deltaA: DataFrame,
      deltaB: DataFrame,
      keys: Seq[String]): Unit = {
    val aPrev = readBatches(spark, view.aDir, batchId, deltaA)
    val bPrev = readBatches(spark, view.bDir, batchId, deltaB)
    // Persist the increments first (their overwrite is idempotent and the
    // view delta below re-reads only strictly-older batches, so a crash
    // between these writes and the view write replays cleanly).
    deltaA.write.mode("overwrite").parquet(s"${view.aDir}/batch=$batchId")
    deltaB.write.mode("overwrite").parquet(s"${view.bDir}/batch=$batchId")
    val aNow = aPrev.unionByName(
      spark.read.schema(deltaA.schema).parquet(s"${view.aDir}/batch=$batchId"))
    val dB = spark.read.schema(deltaB.schema)
      .parquet(s"${view.bDir}/batch=$batchId")
    val dA = spark.read.schema(deltaA.schema)
      .parquet(s"${view.aDir}/batch=$batchId")
    val viewDelta = dA.join(bPrev, keys).unionByName(aNow.join(dB, keys))
    viewDelta.write.mode("overwrite").parquet(s"${view.vDir}/batch=$batchId")
  }

  /** The maintained view: union of all completed wave deltas. */
  def current(spark: SparkSession, view: View, template: DataFrame): DataFrame =
    readBatches(spark, view.vDir, Long.MaxValue, template)
}
