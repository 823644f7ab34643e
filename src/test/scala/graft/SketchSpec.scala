package graft

import org.apache.spark.sql.functions._

/** Mergeable-sketch semantics — the property that makes approximate
  * aggregation scale: partial sketches built independently per shard must
  * merge to EXACTLY the sketch (and thus the estimate) a single global
  * pass produces. That associativity is what lets a 1000-executor cluster
  * build per-partition state and combine it in a tree, instead of
  * shipping raw values to one place. DataSketches HLL is deterministic for
  * a fixed input multiset, so the equality is exact, not approximate —
  * only the estimate-vs-truth comparison carries an error band. */
class SketchSpec extends SparkSpec {

  test("HLL sketches merge associatively: sharded build == global build") {
    val s = spark
    import s.implicits._
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey")
    // Global single-pass sketch estimate.
    val global = li.agg(
      hll_sketch_estimate(hll_sketch_agg($"l_partkey")).as("est"))
      .as[Long].head()
    // Shard by an arbitrary key (16 ways), sketch per shard, merge.
    val merged = li
      .groupBy(pmod($"l_orderkey", lit(16)).as("shard"))
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[Long].head()
    assert(merged === global,
      "sharded sketch merge must equal the single-pass sketch exactly")
    // And the estimate lands inside HLL's error band around exact truth.
    val exact = li.select($"l_partkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"HLL estimate $merged vs exact $exact drifted >5%")
  }

  test("KLL-style approx percentile: partial accuracy against the exact rank") {
    val s = spark
    import s.implicits._
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
    val approx = li.agg(
      percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("p"))
      .as[Double].head()
    val n = li.count()
    // Exact rank of the approximate answer must sit within ±2% of the
    // median position — the accuracy contract that holds under merging.
    val below = li.filter($"l_extendedprice" <= approx).count()
    val frac = below.toDouble / n
    assert(frac > 0.48 && frac < 0.52,
      s"approx median $approx sits at rank fraction $frac")
  }

  test("rel_cdf_sketch: shard histograms SUM-merge to the corpus sketch; error <= one bucket width") {
    val s = spark
    import s.implicits._
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_linestatus".as("g"), $"l_extendedprice".as("v"),
        $"l_orderkey")
    val stats = li.agg(min($"v").as("mn"), max($"v").as("mx")).collect()(0)
    val (mn, mx) = (stats.getDouble(0), stats.getDouble(1))
    val w = (mx - mn) / 512.0
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("bkt", floor(($"v" - lit(mn)) / lit(w)).cast("long"))
      .groupBy($"g", $"bkt").agg(count(lit(1)).as("cnt"))

    // Merge property: the sketch state is (g, bkt) -> cnt; two shards'
    // states SUM to the corpus state exactly — the map-side combine shape.
    val whole = hist(li).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sharded = (0 to 1).map(sh => hist(li.filter(pmod($"l_orderkey", lit(2)) === sh))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap)
    val merged = (sharded(0).keySet ++ sharded(1).keySet).map { k =>
      k -> (sharded(0).getOrElse(k, 0L) + sharded(1).getOrElse(k, 0L))
    }.toMap
    assert(merged === whole, "shard sketches must SUM-merge to the corpus sketch")

    // Error bound: the interpolated estimate sits within ONE bucket width
    // of the exact ceil-rank order statistic, by construction.
    val est = SparkEntry.queries("rel_cdf_sketch")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val local = li.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    for ((g, (p50, p90, p99)) <- est; (q, e) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
      val vs = local(g)
      val exact = vs((math.ceil(q * vs.size).toLong.max(1L) - 1).toInt)
      assert(math.abs(e - exact) <= w + 1e-9,
        s"group $g q=$q: estimate $e vs exact $exact exceeds bucket width $w")
    }
  }
}
