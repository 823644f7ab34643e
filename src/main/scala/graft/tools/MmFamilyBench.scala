package graft.tools

import graft.GraftSession
import graft.llm.{MmFeatures, MultimodalQueries}

/** End-to-end image-family accounting at a given scale: times the ONE-TIME
  * decode+persist pass ([[MmFeatures.features]] on a cold per-JVM cache)
  * separately from the per-query post-decode work, so the decode-once win
  * is reported honestly (Bench's untimed warm-up would otherwise absorb
  * the build). Prints one JSON line.
  *
  * Usage: runMain graft.tools.MmFamilyBench <sfDir>
  */
object MmFamilyBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.env("SPARK_GRAFT_SF_DIR"))
    val spark = GraftSession.builder("graft-mm-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (_, buildSec) = timed {
      MmFeatures.features(spark, dir).write.format("noop").mode("overwrite").save()
    }
    val qs = MultimodalQueries.queries
    val perQuery = Seq("llm_mm_phash", "llm_mm_dedup", "llm_mm_gate").map { n =>
      val (_, s) = timed {
        qs(n).fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      n -> s
    }
    val (_, audioBuildSec) = timed {
      MmFeatures.audioFeatures(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    val audioQueries = Seq("llm_mm_audio", "llm_mm_audio_dedup").map { n =>
      val (_, s) = timed {
        qs(n).fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
      n -> s
    }
    val total = buildSec + audioBuildSec +
      (perQuery ++ audioQueries).map(_._2).sum
    val q = (perQuery ++ audioQueries)
      .map { case (n, s) => s""""$n":$s""" }.mkString(",")
    // scalastyle:off println
    println(s"""{"metric":"mm_family_e2e","build_sec":$buildSec,"audio_build_sec":$audioBuildSec,$q,"total_sec":$total,"sf":"$dir"}""")
    // scalastyle:on println
    spark.stop()
  }
}
