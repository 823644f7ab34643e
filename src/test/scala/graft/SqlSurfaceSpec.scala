package graft

import graft.sources.Tables
import org.apache.spark.sql.DataFrame

/** The SQL door (SURVEY §8 stretch): users of an analytics engine expect to
  * type SQL, not only the DataFrame API. This spec registers the fixture
  * tables as views plus the engine's injected functions and re-expresses
  * flagship queries as `spark.sql` strings, asserting each produces
  * EXACTLY the library query's rows (same canonicalization the oracle gate
  * uses: column-name sort, stringified values, sorted rows).
  *
  * Spelling notes that make the equivalence exact rather than approximate:
  * decimal-exact aggregates are written out (`CAST(SUM(CAST(… AS
  * DECIMAL(30,6))) AS DOUBLE)`), and float literals carry the `D` suffix —
  * Spark SQL parses a bare `1.0` as DECIMAL(2,1), which would silently
  * change the arithmetic's type lattice vs the DataFrame's `lit(1.0)`.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit = {
    Seq("lineitem", "orders", "customer", "documents").foreach { t =>
      Tables.load(spark, sfDir, t).createOrReplaceTempView(t)
    }
    graft.functions.GraftFunctions.register(spark)
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[String]]) = {
    val cols = df.columns.sorted.toSeq
    val rows = df.selectExpr(cols.map(c => s"`$c`"): _*).collect().toSeq
      .map(r => cols.indices.map(i => String.valueOf(r.get(i))))
      .sortBy(_.mkString("\u0000"))
    (cols, rows)
  }

  private def checkSame(name: String, sql: String): Unit = {
    registerViews()
    val (libCols, libRows) = canon(SparkEntry.queries(name)(spark, sfDir))
    val (sqlCols, sqlRows) = canon(spark.sql(sql))
    assert(sqlCols === libCols, s"$name: column sets differ")
    assert(sqlRows === libRows,
      s"$name: SQL rows (${sqlRows.size}) != library rows (${libRows.size})")
  }

  test("rel_q1_pricing_summary through spark.sql") {
    checkSame("rel_q1_pricing_summary", """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")
  }

  test("rel_q3_shipping_priority through spark.sql") {
    checkSame("rel_q3_shipping_priority", """
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
             date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
             o_orderpriority
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""")
  }

  test("rel_window_rank through spark.sql") {
    checkSame("rel_window_rank", """
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rnk <= 3""")
  }

  test("rel_sort_topk through spark.sql") {
    checkSame("rel_sort_topk", """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  }

  test("rel_basket_pairs through spark.sql") {
    // The SQL door reaches the round-6 surface too: the readable self-join
    // spelling must reproduce the library's HOF pair expansion exactly.
    checkSame("rel_basket_pairs", """
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      ORDER BY support DESC, p1, p2 LIMIT 100""")
  }

  test("rel_agg_mode through spark.sql") {
    checkSame("rel_agg_mode", """
      SELECT l_returnflag, l_quantity AS modal_qty, cnt AS n_occurrences
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                 ORDER BY cnt DESC, l_quantity) AS rn
        FROM (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2))
      WHERE rn = 1""")
  }

  test("rel_abc_analysis through spark.sql") {
    checkSame("rel_abc_analysis", """
      SELECT l_partkey, revenue,
             CASE WHEN cum / total <= 0.8D THEN 'A'
                  WHEN cum / total <= 0.95D THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM (
        SELECT l_partkey, revenue,
               CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER (
                 ORDER BY revenue DESC, l_partkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS cum,
               CAST(SUM(CAST(revenue AS DECIMAL(30,6))) OVER () AS DOUBLE)
                 AS total
        FROM (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice * (1.0D - l_discount)
                   AS DECIMAL(30,6))) AS DOUBLE) AS revenue
          FROM lineitem GROUP BY 1))""")
  }

  test("llm_text_fingerprint through spark.sql (injected native function)") {
    // The custom codegen expression is reachable from the SQL door too —
    // the function registry carries poly_fingerprint into plain SQL text.
    checkSame("llm_text_fingerprint", """
      SELECT doc_id, fp[0] AS full_hash, fp[1] AS min_window_hash
      FROM (SELECT doc_id, poly_fingerprint(text) AS fp FROM documents)""")
  }
}
