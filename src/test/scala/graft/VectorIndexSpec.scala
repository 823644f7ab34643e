package graft

import graft.llm.{VectorIndex, VectorOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index: incremental appends against frozen parameters
  * must be indistinguishable from assigning everything at once, replays
  * must be no-ops, and queries must read only the probed cells' codes. */
class VectorIndexSpec extends SparkSpec {

  private def base = Tables.load(spark, sfDir, "embeddings")
    .withColumn("ve", VectorOps.asDouble("embedding"))
    .select(col("vec_id"), col("ve"))

  test("append with frozen params == assigning the full corpus at once") {
    val idx = tempDir("vecindex_inc")
    val first = base.filter(col("vec_id") % 2 === 0)
    val second = base.filter(col("vec_id") % 2 === 1)

    // Build on the first half (freezes centroids + codebook), append the
    // second half as an increment.
    VectorIndex.build(spark, first, idx)
    VectorIndex.append(spark, second, idx, batchId = 1L)

    // Reference: assign the WHOLE corpus in one pass against the frozen
    // tables — the index accumulated incrementally must match it exactly.
    val cents = spark.read.parquet(s"$idx/centroids")
    val cb = spark.read.parquet(s"$idx/codebook")
    val expected = VectorIndex.assignCodes(base, cents, cb)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).mkString(",")))
      .sorted.toSeq
    val got = VectorIndex.codes(spark, idx)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
        r.getAs[scala.collection.Seq[Int]]("code").mkString(",")))
      .sorted.toSeq
    assert(got === expected)
    assert(got.size.toLong === base.count())

    // Replay idempotence: re-appending the same batch overwrites its own
    // dir only — index contents unchanged.
    VectorIndex.append(spark, second, idx, batchId = 1L)
    val replayed = VectorIndex.codes(spark, idx).count()
    assert(replayed === base.count())
  }

  test("query over an appended index ranks by ADC within probed cells only") {
    val idx = tempDir("vecindex_q")
    VectorIndex.build(spark, base, idx)
    val queries = base.filter(col("vec_id") < 5)
    val res = VectorIndex.query(spark, idx, queries, k = 10, nprobe = 4)
      .collect()
    assert(res.nonEmpty)
    val byQ = res.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 5)
    val cells = VectorIndex.codes(spark, idx)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (q, rows) =>
      // Ranks are dense from 1 and ordered by (adc asc, neighbor asc).
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (da, db) = (a.getAs[Double]("adc"), b.getAs[Double]("adc"))
          assert(da < db || (da == db &&
            a.getAs[Long]("neighbor_id") < b.getAs[Long]("neighbor_id")))
        case _ =>
      }
      // No self-matches.
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
      // Every neighbor really lives in one of the query's 4 probed cells.
      val probed = rows.map(r => cells(r.getAs[Long]("neighbor_id"))).distinct
      assert(probed.length <= 4, s"query $q drew neighbors from ${probed.length} cells")
    }
  }
}
