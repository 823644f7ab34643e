package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Scale-mechanics checks: salted joins preserve semantics, and bucketed
  * tables co-locate their join (zero exchanges in the physical plan). */
class ScaleJoinSpec extends SparkSpec {

  test("salted join == plain join, including duplicate multiplicity") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8)
    assert(salted.count() === plain.count())
    // exceptAll is multiplicity-sensitive: exact multiset equality.
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("identical hot-key rows spread across all salts") {
    val s = spark
    import s.implicits._
    // The pathological case: one hot key, every row byte-identical.
    val hot = Seq.fill(8000)((1L, "payload")).toDF("k", "v")
    val dist = hot.withColumn("salt", Skew.saltColumn(hot, 8))
      .groupBy("salt").count().collect().map(r => r.getLong(1))
    assert(dist.length === 8, s"only ${dist.length} of 8 salts used")
    assert(dist.max < 8000 / 8 * 2, s"salt skewed: max partition ${dist.max}")
  }

  test("bucketed join runs with zero exchanges") {
    val s = spark
    import s.implicits._
    val li = Tables.load(spark, sfDir, "lineitem")
    val ord = Tables.load(spark, sfDir, "orders")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey").agg(sum($"l_quantity"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
