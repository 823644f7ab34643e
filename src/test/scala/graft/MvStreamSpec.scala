package graft

import graft.api.Exact.dsum
import graft.plans.MaterializedView.{MvCountStar, MvDef, MvMax, MvMin, MvSum}
import graft.sources.Tables
import graft.streaming.MvStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streamed MV maintenance: per-run cost ∝ new files, replay-idempotent
  * batches, rewrite flips on exactly at adopt time and answers
  * bit-identically to the direct plan. */
class MvStreamSpec extends SparkSpec {

  private def li = Tables.load(spark, sfDir, "lineitem")

  private def scans(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def withRewriteOff[A](body: => A): A = {
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try body finally spark.conf.set("spark.graft.mv.rewrite", "true")
  }

  test("drain → adopt → rewrite; growth stales; second drain covers only new files") {
    val landing = tempDir("mv_stream_landing") + "/fact"
    val mv = tempDir("mv_stream_rollup")
    val ckpt = tempDir("mv_stream_ckpt")
    val dfn = MvDef(Seq("l_returnflag", "l_linestatus"),
      Seq(MvSum("l_quantity"), MvCountStar, MvMin("l_extendedprice"),
        MvMax("l_extendedprice")), mv)

    def query = spark.read.parquet(landing)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("mn"), max(col("l_extendedprice")).as("mx"))
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted

    // Wave 1 lands; the maintainer drains and adopts.
    li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
      .repartition(3).write.mode("append").parquet(landing)
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    assert(scans(query).contains(mv), "MV not serving after first drain")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))
    val batchesAfterFirst = new java.io.File(mv).list().count(_.startsWith("batch="))
    assert(batchesAfterFirst >= 3, "maxFilesPerTrigger=1 should give one batch per file")

    // Wave 2 lands: fingerprint mismatch → direct plan (correct, slower).
    li.filter(pmod(col("l_orderkey"), lit(3)) =!= 0)
      .repartition(2).write.mode("append").parquet(landing)
    assert(!scans(query).contains(mv), "stale MV wrongly served after growth")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))

    // Second drain: checkpoint resumes — only wave-2 files roll up —
    // and the adopted snapshot covers everything.
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    assert(scans(query).contains(mv), "MV not serving after second drain")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))
    val batchesAfterSecond = new java.io.File(mv).list().count(_.startsWith("batch="))
    assert(batchesAfterSecond > batchesAfterFirst &&
      batchesAfterSecond - batchesAfterFirst <= 2,
      s"second drain should add only wave-2 batches " +
        s"($batchesAfterFirst -> $batchesAfterSecond)")
  }

  test("streamed STAR maintenance: each batch's partial joins the dim; join query served") {
    val landing = tempDir("mv_sstar_landing") + "/fact"
    val dim = tempDir("mv_sstar_dim") + "/dim"
    val mv = tempDir("mv_sstar_rollup")
    val ckpt = tempDir("mv_sstar_ckpt")
    Tables.load(spark, sfDir, "orders").write.parquet(dim)
    val dfn = MvDef(Seq("o_orderpriority"),
      Seq(MvSum("l_extendedprice"), MvCountStar), mv,
      joins = Seq(graft.plans.MaterializedView.MvJoin(
        dim, "l_orderkey", "o_orderkey")))

    def query = spark.read.parquet(landing)
      .join(spark.read.parquet(dim), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice")).as("sp"), count(lit(1)).as("n"))
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted

    li.repartition(3).write.mode("append").parquet(landing)
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 2)
    val p = scans(query)
    assert(p.contains(mv) && !p.contains(landing) && !p.contains(dim),
      s"star join query not MV-served after drain:\n$p")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))
  }

  test("streamed TWO-dim star maintenance: chain partials per batch; growth stales; second drain re-serves") {
    val landing = tempDir("mv_s2star_landing") + "/fact"
    val dimO = tempDir("mv_s2star_dimo") + "/orders"
    val dimC = tempDir("mv_s2star_dimc") + "/customer"
    val mv = tempDir("mv_s2star_rollup")
    val ckpt = tempDir("mv_s2star_ckpt")
    Tables.load(spark, sfDir, "orders").write.parquet(dimO)
    Tables.load(spark, sfDir, "customer").write.parquet(dimC)
    val dfn = MvDef(Seq("c_mktsegment"),
      Seq(MvSum("l_extendedprice"), MvCountStar), mv,
      joins = Seq(
        graft.plans.MaterializedView.MvJoin(dimO, "l_orderkey", "o_orderkey"),
        graft.plans.MaterializedView.MvJoin(dimC, "o_custkey", "c_custkey")))

    def query = spark.read.parquet(landing)
      .join(spark.read.parquet(dimO), col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(dimC), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted

    li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
      .repartition(2).write.mode("append").parquet(landing)
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    val p = scans(query)
    assert(p.contains(mv) && !p.contains(landing) && !p.contains(dimO) &&
      !p.contains(dimC), s"two-dim star query not MV-served after drain:\n$p")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))

    // Growth stales; the next drain covers only the new files and
    // re-serves bit-identically (each delta partial re-joins BOTH dims).
    li.filter(pmod(col("l_orderkey"), lit(2)) === 1)
      .repartition(1).write.mode("append").parquet(landing)
    assert(!scans(query).contains(mv), "stale two-dim MV wrongly served")
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    assert(scans(query).contains(mv), "not re-served after second drain")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))
  }

  test("compaction between drains: batch LSM collapses, stream resumes, serves exact") {
    val landing = tempDir("mv_cstream_landing") + "/fact"
    val mv = tempDir("mv_cstream_rollup")
    val ckpt = tempDir("mv_cstream_ckpt")
    val dfn = MvDef(Seq("l_returnflag", "l_linestatus"),
      Seq(MvSum("l_quantity"), MvCountStar, MvMin("l_extendedprice"),
        MvMax("l_extendedprice")), mv)
    def query = spark.read.parquet(landing)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted
    def batchDirs = new java.io.File(mv).list().count(_.startsWith("batch="))

    // Wave 1: many small files → one batch per trigger (the fragmentation
    // a long-lived maintainer accrues).
    li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
      .repartition(6).write.mode("append").parquet(landing)
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    val truth1 = withRewriteOff(rows(query))
    assert(batchDirs >= 6)
    // Compact (keepLast=1 keeps the only replayable batch id); the serve
    // stays exact and MV-backed.
    graft.plans.MaterializedView.compact(spark, landing)
    assert(batchDirs == 2, s"expected merged+kept dirs, got $batchDirs")
    assert(scans(query).contains(mv) && rows(query).sameElements(truth1))

    // Wave 2 + another drain: the checkpointed stream continues over the
    // compacted LSM (its batch ids keep rising past the merged range).
    li.filter(pmod(col("l_orderkey"), lit(3)) =!= 0)
      .repartition(2).write.mode("append").parquet(landing)
    MvStream.runAvailableNow(spark, landing, li.schema, dfn, ckpt,
      maxFilesPerTrigger = 1)
    assert(scans(query).contains(mv), "MV not serving after post-compact drain")
    assert(rows(query).sameElements(withRewriteOff(rows(query))))
  }
}
