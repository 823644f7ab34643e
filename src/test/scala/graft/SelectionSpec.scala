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
