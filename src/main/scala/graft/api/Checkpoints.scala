package graft.api

import org.apache.spark.sql.SparkSession

/** Reliable-checkpoint directory resolution for the iterative operators
  * (label propagation, k-means rounds, PCA deflation).
  *
  * Reliable checkpoints only deliver their executor-loss guarantee if the
  * directory is visible to every executor. Resolution order therefore
  * prefers configured shared storage and falls back to a driver-local temp
  * dir ONLY where that is correct (local mode):
  *   1. an explicit `spark.checkpoint.dir` — the operator's own knob;
  *   2. `<spark.sql.warehouse.dir>/graft-checkpoints` — the warehouse is
  *      shared storage on any real deployment, and
  *      `spark.cleaner.referenceTracking.cleanCheckpoints` (set by
  *      [[graft.GraftSession]]) reclaims the files once their RDDs are GC'd;
  *   3. a JVM temp dir — local-mode-only fallback: a driver-local path is
  *      NOT executor-visible on a cluster, so this branch is taken only
  *      when neither location is configured.
  */
object Checkpoints {
  def ensureDir(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      val dir = sc.getConf.getOption("spark.checkpoint.dir")
        .orElse(Option(s.conf.get("spark.sql.warehouse.dir", null))
          .filter(_.nonEmpty).map(w => s"$w/graft-checkpoints"))
        .getOrElse(java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
      sc.setCheckpointDir(dir)
    }
  }
}
