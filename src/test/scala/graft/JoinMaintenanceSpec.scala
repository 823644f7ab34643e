package graft

import graft.streaming.JoinMaintenance
import org.apache.spark.sql.DataFrame

/** Incremental join-view maintenance: after every wave the maintained view
  * must equal a full recompute of A ⋈ B (as a multiset — duplicate keys
  * carry multiplicity), and replaying a wave must be a no-op.
  */
class JoinMaintenanceSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toSeq.mkString("|")).groupBy(identity)
      .map { case (k, v) => k -> v.length }

  test("view equals full recompute after each wave; replay and crash-retry are no-ops") {
    val view = JoinMaintenance.View(tempDir("ivm"))
    // Waves chosen so every delta-join term is exercised: ΔA⋈B_prev
    // (wave 3's key 2), A_prev⋈ΔB (wave 1's key 1, wave 2's key 4 arrives
    // AFTER... key 4 pairs in wave 3), ΔA⋈ΔB (wave 0's key 2), duplicate
    // keys for multiplicity (key 3 twice on B), and empty deltas.
    val wavesA: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> "o1", 2L -> "o2"),
      Seq(3L -> "o3"),
      Seq.empty,
      Seq(2L -> "o2b", 4L -> "o4"))
    val wavesB: Seq[Seq[(Long, String)]] = Seq(
      Seq(2L -> "i2"),
      Seq(1L -> "i1", 3L -> "i3", 3L -> "i3b"),
      Seq(4L -> "i4", 1L -> "i1b"),
      Seq.empty)
    def dfA(w: Seq[(Long, String)]) = w.toDF("k", "o")
    def dfB(w: Seq[(Long, String)]) = w.toDF("k", "i")
    val template = dfA(Seq.empty).join(dfB(Seq.empty), Seq("k")).limit(0)

    var allA = Seq.empty[(Long, String)]
    var allB = Seq.empty[(Long, String)]
    wavesA.indices.foreach { i =>
      JoinMaintenance.step(spark, view, i.toLong,
        dfA(wavesA(i)), dfB(wavesB(i)), Seq("k"))
      allA ++= wavesA(i)
      allB ++= wavesB(i)
      val full = dfA(allA).join(dfB(allB), Seq("k"))
      assert(multiset(JoinMaintenance.current(spark, view, template))
        === multiset(full), s"view diverged from full recompute at wave $i")
    }
    val finalExpected = multiset(dfA(allA).join(dfB(allB), Seq("k")))
    assert(finalExpected.values.sum > 5, "fixture must produce real pairs")

    // Replay wave 2 verbatim (retry after a reported failure): idempotent.
    JoinMaintenance.step(spark, view, 2L, dfA(wavesA(2)), dfB(wavesB(2)), Seq("k"))
    assert(multiset(JoinMaintenance.current(spark, view, template)) === finalExpected)

    // Crash between side writes and the view write: the wave's view delta
    // is missing on disk. A retry of the SAME wave must restore it exactly.
    val lost = new org.apache.hadoop.fs.Path(s"${view.vDir}/batch=1")
    lost.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(lost, true)
    assert(multiset(JoinMaintenance.current(spark, view, template)) !== finalExpected)
    JoinMaintenance.step(spark, view, 1L, dfA(wavesA(1)), dfB(wavesB(1)), Seq("k"))
    assert(multiset(JoinMaintenance.current(spark, view, template)) === finalExpected)
  }
}
