package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared query: the Spark implementation plus (when SQL-expressible)
  * its DuckDB oracle. `bench = true` marks it as a headline benchmark query.
  */
final case class QuerySpec(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    bench: Boolean = false,
    doc: String = "")

trait QueryModule {
  def queries: Map[String, QuerySpec]
}

/** Deterministic numerics shared by the Spark side and the DuckDB oracle.
  *
  * Floating-point SUM/AVG are order-dependent; Spark's partial aggregation
  * order differs from DuckDB's, so a naive `sum(double)` would drift in the
  * low bits and break hash comparison. Both sides therefore accumulate in
  * exact DECIMAL and cast the final value back to double — bit-identical
  * results independent of partitioning or parallelism, at any scale.
  */
object Exact {
  /** sum(x) with exact decimal accumulation, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast("double")

  /** avg(x) = exact-decimal sum / non-null count, evaluated in double. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-side (DuckDB) equivalents. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
