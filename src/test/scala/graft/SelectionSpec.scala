package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** Domain-decoupling contract for the two-phase exact selection: driver
  * rows bound by construction (groups × 4096), never by the value range,
  * and the selected element is exactly the ceil-rank order statistic. */
class SelectionSpec extends SparkSpec {

  private def refQuantile(vs: Seq[Double], q: Double): Double = {
    val sorted = vs.sorted
    sorted((math.ceil(q * vs.size).toLong.max(1L) - 1).toInt)
  }

  test("wide-domain column (epoch-micros scale) keeps driver rows bounded") {
    val s = spark
    import s.implicits._
    // Two groups spanning ~1.7e15 — the domain where fixed 64-wide
    // buckets would histogram ~2.6e13 driver rows. Values are exact in
    // double (integers below 2^53).
    val n = 100000L
    val df = spark.range(n).select(
      when(col("id") % 3 === 0, lit("a")).otherwise(lit("b")).as("grp"),
      (lit(1.7e15) + col("id") * lit(1.7e10)).as("v"))
    val (sel, histRows) = Selection.groupQuantiles(
      df, "grp", col("v"), Seq(0.5, 0.99))
    assert(histRows <= 2L * (Selection.targetBuckets + 2),
      s"driver histogram rows $histRows scale with the domain, not the bound")

    val local = df.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSeq }
    for (g <- Seq("a", "b"); q <- Seq(0.5, 0.99))
      assert(sel((g, q)) === refQuantile(local(g), q),
        s"group $g q=$q")
  }

  test("constant column and tiny groups: width guard, rank-1 floor") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0))
      .toDF("grp", "v")
    val (sel, _) = Selection.groupQuantiles(df, "grp", col("v"), Seq(0.5, 0.99))
    assert(sel(("a", 0.5)) === 5.0 && sel(("a", 0.99)) === 5.0)
    assert(sel(("b", 0.5)) === 1.0 && sel(("b", 0.99)) === 1.0)
  }

  test("empty input is a defined empty result, not an NPE") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", 1.0)).toDF("grp", "v").filter(col("v") < 0)
    val (sel, histRows) = Selection.groupQuantiles(df, "grp", col("v"), Seq(0.5))
    assert(sel.isEmpty && histRows === 0L)
  }

  test("skewed point mass: residual collect stays one row per target") {
    val s = spark
    import s.implicits._
    // 90% of group "a" is a single value — the target bucket is O(n).
    // The rn filter must keep the driver pull at one row per
    // (group, fraction), not the whole bucket.
    val n = 50000L
    val df = spark.range(n).select(
      lit("a").as("grp"),
      when(col("id") % 10 =!= 0, lit(42.0))
        .otherwise(col("id").cast("double")).as("v"))
    val (sel, _) = Selection.groupQuantiles(df, "grp", col("v"), Seq(0.5, 0.9))
    val local = df.collect().map(_.getDouble(1)).toSeq
    assert(sel(("a", 0.5)) === refQuantile(local, 0.5))
    assert(sel(("a", 0.9)) === refQuantile(local, 0.9))
  }

  test("high-cardinality grouping trips the driver-row guard loudly") {
    val s = spark
    import s.implicits._
    // 10k distinct groups; with a tight maxRows the histogram must fail
    // fast (limit-bounded collect) instead of swelling the driver.
    val df = spark.range(10000).select(
      concat(lit("g"), col("id")).as("grp"), col("id").cast("double").as("v"))
    val e = intercept[IllegalStateException] {
      Selection.groupQuantiles(df, "grp", col("v"), Seq(0.5), maxRows = 1000)
    }
    assert(e.getMessage.contains("driver rows"))
    // And at the default bound the same 10k-group call succeeds (10k
    // single-value groups = 10k histogram rows, far under the cap).
    val (sel, histRows) = Selection.groupQuantiles(df, "grp", col("v"), Seq(0.5))
    assert(histRows === 10000L && sel(("g0", 0.5)) === 0.0 &&
      sel(("g9999", 0.5)) === 9999.0)
  }

  test("matches the window-sort spelling on real data at every fraction") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_linestatus"), col("l_extendedprice"))
    val qs = Seq(0.05, 0.5, 0.9, 0.99)
    val (sel, _) = Selection.groupQuantiles(
      li, "l_linestatus", col("l_extendedprice"), qs)
    val local = li.collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSeq }
    for (g <- local.keys; q <- qs)
      assert(sel((g, q)) === refQuantile(local(g), q), s"group $g q=$q")
  }
}
