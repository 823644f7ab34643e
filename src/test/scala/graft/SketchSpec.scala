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
}
