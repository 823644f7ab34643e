package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The PK–FK join-elimination rule: fires only in the declared-safe shape,
  * never changes results. */
class JoinEliminationSpec extends SparkSpec {

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def customer = Tables.load(spark, sfDir, "customer")
  private def nation   = Tables.load(spark, sfDir, "nation")

  test("unreferenced dimension join is eliminated from the plan") {
    val df = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"))
    val p = physical(df)
    assert(!p.contains("Join"), s"dimension join not eliminated:\n$p")
  }

  test("eliminated join returns exactly the fact-side rows with the key aliased") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)).sorted
    val eliminated = rows(customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey")))
    val expected = rows(customer.select(col("c_custkey"), col("c_nationkey")))
    assert(eliminated.sameElements(expected))
  }

  test("reading a dimension attribute keeps the join") {
    val df = customer
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    assert(physical(df).contains("Join"), "join wrongly eliminated (n_name is read)")
  }

  test("a filtered dimension keeps the join (could drop fact rows)") {
    val df = customer
      .join(nation.filter(col("n_regionkey") === 1), // real filter, not IsNotNull
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"))
    assert(physical(df).contains("Join"), "join wrongly eliminated under a filter")
  }

  test("a DERIVED column named like a declared FK keeps the join") {
    // expr.as("c_nationkey") carries no integrity declaration: eliminating
    // here would return every fact row though the join matches none.
    val derived = customer.select(col("c_custkey"),
      (col("c_custkey") + 1000000).as("c_nationkey"))
    val df = derived
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"))
    assert(physical(df).contains("Join"), "join wrongly eliminated on derived FK")
    assert(df.count() == 0, "no derived value matches a nation key")
  }

  test("elimination fires regardless of join or operand order") {
    val df = nation
      .join(customer, col("n_nationkey") === col("c_nationkey"))
      .select(col("c_custkey"), col("n_nationkey"))
    assert(!physical(df).contains("Join"),
      "dimension-on-the-left join not eliminated")
  }

  test("a same-named column on an UNRELATED relation keeps the join") {
    val s = spark
    import s.implicits._
    // A table that merely reuses the declared FK's column name carries no
    // integrity guarantee (these values include nulls and non-matches: an
    // inner join drops those rows, so elimination would be wrong). The
    // declaration binds to the table identity, so neither a foreign
    // parquet table nor a local relation may activate the rule.
    val dir = tempDir("not_customer")
    Seq((1L, Some(0L)), (2L, Some(999999L)), (3L, None))
      .toDF("row_id", "c_nationkey").write.mode("overwrite").parquet(dir)
    val foreign = spark.read.parquet(dir)
    val viaParquet = foreign
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("row_id"), col("n_nationkey"))
    assert(physical(viaParquet).contains("Join"),
      "join wrongly eliminated for a same-named column of an unrelated table")
    assert(viaParquet.count() == 1,
      "integrity-free rows must be dropped by the real join")

    val local = Seq((1L, 0L), (2L, 999999L)).toDF("row_id", "c_nationkey")
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("row_id"), col("n_nationkey"))
    assert(physical(local).contains("Join"),
      "join wrongly eliminated for a local relation with a declared column name")
  }

  test("undeclared key pairs keep the join") {
    // Self-join on an arbitrary column: no declaration, no elimination.
    val a = nation.select(col("n_nationkey"), col("n_regionkey"))
    val b = nation.select(col("n_nationkey").as("nk2"))
    val df = a.join(b, col("n_regionkey") === col("nk2"))
      .select(col("n_nationkey"), col("nk2"))
    assert(physical(df).contains("Join"), "join wrongly eliminated for undeclared pair")
  }
}
