package graft

import graft.operators.CdfSketch
import graft.streaming.CdfStream
import org.apache.spark.sql.functions._

/** The CDF-sketch aggregator contract: SQL-callable, mergeable (shard
  * sketches sum to the corpus sketch exactly), and its streamed
  * maintenance equals the batch sketch across waves and a restart. */
class CdfSketchSpec extends SparkSpec {

  private def corpus = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .select(col("l_linestatus").as("g"), col("l_extendedprice").as("v"),
      col("l_orderkey"))

  private def domain = {
    val r = corpus.agg(min(col("v")), max(col("v"))).collect()(0)
    val (mn, mx) = (r.getDouble(0), r.getDouble(1))
    (mn, if (mx == mn) 1.0 else (mx - mn) / 512.0)
  }

  private def sketchOf(df: org.apache.spark.sql.DataFrame, mn: Double,
      w: Double): Map[String, Seq[Long]] = {
    CdfSketch.register(spark)
    df.createOrReplaceTempView("cdf_spec_in")
    spark.sql(
      s"""SELECT g, cdf_sketch(v, CAST('$mn' AS DOUBLE),
         |  CAST('$w' AS DOUBLE)) AS sk
         |FROM cdf_spec_in GROUP BY g""".stripMargin)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("two shards' sketches merge into the corpus sketch exactly") {
    val (mn, w) = domain
    val whole = sketchOf(corpus, mn, w)
    val sa = sketchOf(corpus.filter(pmod(col("l_orderkey"), lit(2)) === 0), mn, w)
    val sb = sketchOf(corpus.filter(pmod(col("l_orderkey"), lit(2)) === 1), mn, w)
    assert(whole.keySet === (sa.keySet ++ sb.keySet))
    whole.foreach { case (g, sk) =>
      val merged = (0 until CdfSketch.slots).map { i =>
        sa.get(g).map(_(i)).getOrElse(0L) + sb.get(g).map(_(i)).getOrElse(0L)
      }
      assert(sk === merged, s"group $g: merged shards != corpus sketch")
    }
    // Sketch mass equals row count: nothing clamped away, nothing dropped.
    assert(whole.values.map(_.sum).sum === corpus.count())
  }

  test("streamed sketch across waves + restart equals the batch sketch") {
    val (mn, w) = domain
    val landing = tempDir("cdfs_landing")
    val state = tempDir("cdfs_state")
    val cp = tempDir("cdfs_cp")
    (0 to 2).foreach { wave =>
      corpus.filter(pmod(col("l_orderkey"), lit(3)) === wave).select("g", "v")
        .coalesce(2).write.mode("append").parquet(landing)
      // Fresh query per wave resuming the checkpoint = a restart per wave.
      CdfStream.runAvailableNow(spark, landing, state, cp, mn, w,
        maxFilesPerTrigger = 1)
    }
    val streamed = CdfStream.sketchArrays(spark, state).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val batch = sketchOf(corpus, mn, w)
    assert(streamed === batch)
    // Re-draining with nothing new is a no-op (checkpoint resumes past
    // all committed batches).
    CdfStream.runAvailableNow(spark, landing, state, cp, mn, w)
    val again = CdfStream.sketchArrays(spark, state).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(again === batch, "empty drain changed the accumulated sketch")
  }

  test("quantile estimate is within one bucket width of the exact quantile") {
    val (mn, w) = domain
    val vs = corpus.select("v").collect().map(_.getDouble(0)).sorted
    val whole = sketchOf(corpus.withColumn("g", lit("all")), mn, w)("all")
    val est = spark.range(1).select(
      CdfSketch.quantileEst(
        typedLit(whole), 0.5, lit(mn), lit(w)).as("p50"))
      .collect()(0).getDouble(0)
    val exact = vs((math.ceil(0.5 * vs.length) - 1).toInt)
    assert(math.abs(est - exact) <= w,
      s"p50 estimate $est strays more than one bucket from exact $exact")
  }
}
