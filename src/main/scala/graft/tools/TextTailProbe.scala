package graft.tools

import graft.GraftSession
import graft.llm.{Dedup, TextFeatures}
import org.apache.spark.sql.functions._

/** Per-stage attribution for the sf100 text-tail watch item (round-13
  * verdict #1): `llm_dedup_jaccard` (r=4, b=64) and `llm_dedup_keep`
  * (b=32 + label-prop closure + anti-join) turned superlinear on the
  * sf30→sf100 decade (e≈1.31 / 1.25) while their siblings stayed ≤0.83.
  * The fix must be MEASURED, not presumed: this probe times and counts
  * every stage of both queries — band rows, bucket-size tail, raw
  * candidate volume Σ C(sz,2), distinct candidates, verified pairs,
  * closure iterations — with the Bench spill counters attached, under
  * whatever SPARK_GRAFT_SHUFFLE_PARTITIONS the run sets. Candidate volume
  * growing faster than the corpus means the banding is the bottleneck;
  * flat candidates with growing spill means the fixed partition count is
  * (the `llm_dedup_containment` precedent).
  *
  * Usage: runMain graft.tools.TextTailProbe <sfDir> [jaccard|keep|both]
  * Appends one JSON line to TEXT_TAIL_PROBE.json (or
  * SPARK_GRAFT_TEXTTAIL_OUT).
  */
object TextTailProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = args.lift(1).getOrElse("both")
    val spark = GraftSession.builder("graft-texttail").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled); ()
        }
      }
    })

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def stage[A](name: String)(body: => A): A = {
      val s0 = memSpill.get + diskSpill.get
      val t0 = System.nanoTime()
      val a = body
      out(s"${name}_sec") = f"${(System.nanoTime() - t0) / 1e9}%.2f"
      out(s"${name}_spill_mb") =
        f"${(memSpill.get + diskSpill.get - s0) / 1e6}%.1f"
      a
    }

    val feat = TextFeatures.features(spark, dir, "near")
    stage("feat_read") { out("n_docs") = feat.count().toString }

    def probe(tag: String, r: Int, b: Int, tau: Double): Unit = {
      val bands = TextFeatures.bands(feat, r, b)
      stage(s"${tag}_buckets") {
        val st = bands.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("sz"))
          .agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
            sum(col("sz") * (col("sz") - 1) / 2).as("cand_volume"),
            sum(when(col("sz") > 100, col("sz") * (col("sz") - 1) / 2)
              .otherwise(0L)).as("cand_volume_gt100"))
          .collect()(0)
        out(s"${tag}_n_buckets") = st.get(0).toString
        out(s"${tag}_max_bucket") = st.get(1).toString
        out(s"${tag}_cand_volume") = st.get(2).toString
        out(s"${tag}_cand_volume_gt100") = st.get(3).toString
      }
      val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
        .hint("merge")
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("bh")),
          Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val candC = stage(s"${tag}_candidates") { cand.count() }
      out(s"${tag}_n_candidates") = candC.toString
      val pairs = Dedup.lshJaccardPairsFeat(feat, tau = tau, r = r, b = b)
      val np = stage(s"${tag}_full_query") { pairs.count() }
      out(s"${tag}_n_pairs") = np.toString
    }

    if (which == "jaccard" || which == "both") probe("jac", 4, 64, 0.8)
    if (which == "keep" || which == "both") {
      probe("keep_pairs", 4, 32, 0.8)
      val pairs = Dedup.minhashPairsFeat(feat)
      val lbl = stage("keep_closure") { Dedup.labels(pairs).count() }
      out("keep_n_labeled") = lbl.toString
      val kept = stage("keep_antijoin") {
        Dedup.keepSet(feat, Dedup.minhashPairsFeat(feat)).count()
      }
      out("keep_n_kept") = kept.toString
    }

    out("shuffle_partitions") = spark.conf.get("spark.sql.shuffle.partitions")
    out("sf") = "\"" + dir + "\""
    val json = out.map { case (k, v) =>
      val quoted = if (v.startsWith("\"") || v.forall(c =>
        c.isDigit || c == '.' || c == '-')) v else "\"" + v + "\""
      "\"" + k + "\":" + quoted
    }.mkString("{", ",", "}")
    // scalastyle:off println
    println(json)
    // scalastyle:on println
    val path = sys.env.getOrElse("SPARK_GRAFT_TEXTTAIL_OUT", "TEXT_TAIL_PROBE.json")
    val w = new java.io.FileWriter(path, true)
    try w.write(json + "\n") finally w.close()
    spark.stop()
  }
}
