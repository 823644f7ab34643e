package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** Cost-based join reorder: with ANALYZE-collected table + column
  * statistics and CBO on, Catalyst rewrites a deliberately bad join order
  * (fact ⋈ fact first) into the selective-dimension-first order — the
  * stats-driven counterpart of the runtime AQE rules the engine already
  * leans on. Statistics live in the session catalog, so this uses real
  * saved tables, not temp views (temp views carry no stats). */
class CboReorderSpec extends SparkSpec {

  private def innermostJoinTables(plan: LogicalPlan): Set[String] = {
    // The first join executed is the deepest Join node; report which base
    // tables feed it directly (no Join below either side).
    val joins = plan.collect { case j: Join => j }
    val deepest = joins.filter(j =>
      j.children.forall(c => c.collect { case jj: Join => jj }.isEmpty))
    deepest.flatMap(_.collectLeaves().flatMap(_.output.map(_.name))).toSet
  }

  test("ANALYZE statistics flip a fact-fact-first join order") {
    val s = spark
    val conf = spark.conf
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    try {
      for (t <- Seq("lineitem", "orders", "customer")) {
        graft.sources.Tables.load(spark, sfDir, t)
          .write.mode("overwrite").saveAsTable(s"cbo_db.$t")
        spark.sql(s"ANALYZE TABLE cbo_db.$t COMPUTE STATISTICS")
      }
      spark.sql("ANALYZE TABLE cbo_db.lineitem COMPUTE STATISTICS FOR COLUMNS l_orderkey")
      spark.sql("ANALYZE TABLE cbo_db.orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")
      spark.sql("ANALYZE TABLE cbo_db.customer COMPUTE STATISTICS FOR COLUMNS c_custkey, c_mktsegment")

      // Deliberately bad written order: the two big tables join first; the
      // selective dimension (one market segment) comes last.
      val sql = """
        SELECT count(*) AS n
        FROM cbo_db.lineitem l
        JOIN cbo_db.orders o ON l.l_orderkey = o.o_orderkey
        JOIN cbo_db.customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'"""

      conf.set("spark.sql.cbo.enabled", "false")
      val without = innermostJoinTables(spark.sql(sql).queryExecution.optimizedPlan)
      assert(without.contains("l_orderkey") && !without.contains("c_custkey"),
        s"without CBO the written (fact ⋈ fact) order should stand: $without")

      conf.set("spark.sql.cbo.enabled", "true")
      conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      val df = spark.sql(sql)
      val withCbo = innermostJoinTables(df.queryExecution.optimizedPlan)
      assert(withCbo.contains("c_custkey"),
        s"CBO should join the filtered dimension first, got: $withCbo")
      // Reorder must not change the answer.
      val expect = graft.sources.Tables.load(spark, sfDir, "lineitem")
        .join(graft.sources.Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.sources.Tables.load(spark, sfDir, "customer")
          .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .count()
      assert(df.collect().head.getLong(0) === expect)
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
      spark.sql("DROP DATABASE IF EXISTS cbo_db CASCADE")
    }
  }
}
