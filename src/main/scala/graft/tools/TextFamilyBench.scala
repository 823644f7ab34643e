package graft.tools

import graft.GraftSession
import graft.llm.{Dedup, TextFeatures}

/** End-to-end text-dedup-family accounting at a given scale — the
  * [[MmFamilyBench]] treatment for [[TextFeatures]]: times the ONE-TIME
  * shingle/signature build (cold per-JVM cache) separately from each
  * query's post-build work, so the shingle-once win is reported honestly
  * (an untimed warm-up would otherwise absorb the build). The family
  * total INCLUDES the build — the claim is end-to-end, not
  * build-laundered. Prints one JSON line and appends it to
  * TEXT_FAMILY_BENCH.json (or SPARK_GRAFT_TEXTFAM_OUT).
  *
  * Usage: runMain graft.tools.TextFamilyBench <sfDir> [query...]
  */
object TextFamilyBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.builder("graft-textfam-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val defaultQs = Seq(
      "llm_dedup_minhash", "llm_dedup_jaccard", "llm_dedup_clusters",
      "llm_dedup_keep", "llm_dedup_passage", "llm_dedup_simhash",
      "llm_dedup_containment", "llm_curate_e2e")
    val names = if (args.length > 1) args.drop(1).toSeq else defaultQs

    // The near-corpus build feeds the near-dup queries; the plain build
    // feeds curate_e2e / dataset_split. Timed separately, and only the
    // tables the requested queries actually read are built — a targeted
    // run must not pay (or require the corpus for) the other table.
    def buildSec(kind: String): Double = timed {
      TextFeatures.features(spark, dir, kind)
        .write.format("noop").mode("overwrite").save()
    }._2
    val needsPlain = names.exists(n =>
      n == "llm_curate_e2e" || n == "llm_dataset_split")
    val needsNear = names.exists(n =>
      n != "llm_curate_e2e" && n != "llm_dataset_split")
    val nearBuildSec = if (needsNear) buildSec("near") else 0.0
    val plainBuildSec = if (needsPlain) buildSec("plain") else 0.0
    val qs = Dedup.queries
    val perQuery = names.map { n =>
      val (_, s) = timed {
        qs(n).fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      // scalastyle:off println
      println(s"[textfam] $n ${f"$s%.1f"}s")
      // scalastyle:on println
      n -> s
    }
    val total = nearBuildSec + plainBuildSec + perQuery.map(_._2).sum
    val q = perQuery.map { case (n, s) => s""""$n":${f"$s%.2f"}""" }.mkString(",")
    // Self-describing conf: the static width plus the AQE initial width
    // (the knob that lets reducer counts scale with the data — see
    // GraftSession) so artifact lines are a config ledger, not bare
    // numbers.
    val conf = s"shuffle=${spark.conf.get("spark.sql.shuffle.partitions")};" +
      s"initial=${spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "-")}"
    val json =
      s"""{"metric":"text_family_e2e","conf":"$conf","near_build_sec":${f"$nearBuildSec%.2f"},""" +
        s""""plain_build_sec":${f"$plainBuildSec%.2f"},$q,""" +
        s""""total_sec":${f"$total%.2f"},"sf":"$dir"}"""
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    val out = sys.env.getOrElse("SPARK_GRAFT_TEXTFAM_OUT", "TEXT_FAMILY_BENCH.json")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.writeString(p,
      (if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else "") +
        json + "\n")
    spark.stop()
  }
}
