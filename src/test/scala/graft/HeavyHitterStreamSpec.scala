package graft

import graft.streaming.HeavyHitterStream
import org.apache.spark.sql.functions._

/** Streaming Misra–Gries heavy hitters: sketch bounds hold against exact
  * recounts across waves + a restart, the support guarantee has no false
  * negatives, replays rebuild identical state, and the in-core MG pass
  * satisfies the textbook invariants. */
class HeavyHitterStreamSpec extends SparkSpec {

  private val M = 32

  /** Deterministic Zipf-ish corpus: token `w<i>` appears with frequency
    * ∝ 1/(i+1); doc j carries 30 tokens drawn by a fixed hash. */
  private def wave(ids: Range): Seq[(Long, String)] =
    ids.map { j =>
      val toks = (0 until 30).map { p =>
        // Quadratic-ish skew: low ranks dominate.
        val h = math.abs((j * 31 + p * 17).toLong * 2654435761L)
        val r = (h % 10000).toInt
        val i = math.min(199, (math.sqrt(r.toDouble) / 2).toInt)
        s"w$i"
      }
      (j.toLong, toks.mkString(" "))
    }

  private def exactCounts(rows: Seq[(Long, String)]): Map[String, Long] =
    rows.flatMap(_._2.split("\\s+")).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }

  test("misraGries: counters undercount by at most the decrement total") {
    val toks = wave(0 until 50).flatMap(_._2.split("\\s+"))
    val (c, d) = HeavyHitterStream.misraGries(toks.iterator, M)
    assert(c.size <= M)
    val exact = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    c.foreach { case (t, v) =>
      assert(v <= exact(t), s"$t overcounts")
      assert(v >= exact(t) - d, s"$t undercounts past d=$d")
    }
    assert(d <= toks.length / (M + 1))
  }

  test("streamed sketch: bounds + support guarantee across waves, restart, replay") {
    val s = spark; import s.implicits._
    val landing = tempDir("hh-landing")
    val state = tempDir("hh-state")
    val ckpt = tempDir("hh-ckpt")

    val w1 = wave(0 until 400)
    w1.toDF("doc_id", "text").repartition(3)
      .write.mode("append").parquet(landing)
    HeavyHitterStream.runAvailableNow(spark, landing, state, ckpt, M,
      maxFilesPerTrigger = 2)

    // Wave 2 lands after a full stop — the query restarts from the
    // checkpoint and the batch-id chain continues.
    val w2 = wave(400 until 900)
    w2.toDF("doc_id", "text").repartition(3)
      .write.mode("append").parquet(landing)
    HeavyHitterStream.runAvailableNow(spark, landing, state, ckpt, M,
      maxFilesPerTrigger = 2)

    val lastBatch = new java.io.File(s"$state/summary").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).max
    val exact = exactCounts(w1 ++ w2)
    val n = exact.values.sum

    // Every reported token's [lb, ub] brackets its exact count.
    val rep = HeavyHitterStream.report(spark, state, lastBatch, phi = 0.035)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rep.nonEmpty)
    rep.foreach { case (t, lb, ub) =>
      val e = exact.getOrElse(t, 0L)
      assert(lb <= e && e <= ub, s"$t: [$lb,$ub] misses exact $e")
    }

    // D ≤ N/(m+1); any token with exact > D must be tracked, and the
    // φ-support report can have no false negatives.
    val meta = spark.read.parquet(s"$state/summary/batch=$lastBatch/meta")
      .collect().head
    val (d, nMeta) = (meta.getLong(0), meta.getLong(1))
    assert(nMeta == n)
    assert(d <= n / (M + 1))
    val tracked = spark.read
      .parquet(s"$state/summary/batch=$lastBatch/counters")
      .collect().map(_.getString(0)).toSet
    exact.filter(_._2 > d).keys.foreach(t =>
      assert(tracked(t), s"guaranteed-heavy $t untracked"))
    val reported = rep.map(_._1).toSet
    exact.filter(_._2 >= 0.035 * n).keys.foreach(t =>
      assert(reported(t), s"support-φ token $t missing from report"))

    // Replay idempotence: applying the same (id, input) twice — the
    // post-crash foreachBatch contract — rebuilds bit-identical state
    // because each batch reads its predecessor and overwrites itself.
    def snap(id: Long): (Seq[(String, Long)], Seq[(Long, Long)]) = (
      spark.read.parquet(s"$state/summary/batch=$id/counters")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq,
      spark.read.parquet(s"$state/summary/batch=$id/meta")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val extra = wave(900 until 950).toDF("doc_id", "text").repartition(2)
    HeavyHitterStream.applyBatch(extra, lastBatch + 1, state, M)
    val first = snap(lastBatch + 1)
    HeavyHitterStream.applyBatch(extra, lastBatch + 1, state, M)
    assert(snap(lastBatch + 1) == first)

    // A broken chain fails loudly instead of restarting from zero.
    val e = intercept[IllegalStateException] {
      HeavyHitterStream.applyBatch(
        Seq((0L, "x")).toDF("doc_id", "text"), lastBatch + 500, state, M)
    }
    assert(e.getMessage.contains("chain broken"))
  }
}
