package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The portable HyperLogLog construction shared by the batch sketch
  * (`rel_hll_distinct`) and its streaming maintainer (`rel_hll_stream` /
  * [[graft.streaming.DistinctStream]]): 4096 registers indexed by the low
  * 12 bits of a 63-bit positive `md5_long` hash, rank = leading-zero count
  * of the next 40 bits via `length(bin(w))` (integer string length — no
  * float log2 whose boundary rounding could differ between engines), and
  * a register-order estimator fold with explicit DOUBLE casts (bare SQL
  * decimal literals would make one engine do DECIMAL math).
  *
  * The register table (key..., reg, mrho) IS the mergeable sketch state:
  * partials combine by per-register MAX — on a cluster that is the
  * map-side combine; in the streaming maintainer it is the state update.
  * Every fragment here is mirrored verbatim in the DuckDB oracles (with
  * `md5_number_upper` standing in for `md5_long`).
  */
object Hll {

  val m = 4096

  /** 63-bit positive hash of an id expression (sign cleared so `>>` is
    * well-defined identically in Spark and DuckDB). */
  def hpExpr(idSql: String): String =
    s"md5_long(CAST($idSql AS STRING)) & 9223372036854775807"

  val regExpr: String = "hp & 4095"

  val rhoExpr: String =
    """CASE WHEN (hp >> 12) & 1099511627775 = 0 THEN 41
       ELSE 41 - length(bin((hp >> 12) & 1099511627775)) END"""

  /** Self-contained spellings of [[regExpr]]/[[rhoExpr]] with the `hp`
    * stage inlined — a single SQL expression over the source column, as a
    * declaration site (e.g. [[graft.plans.MaterializedView.MvDef]]'s
    * derived columns) needs. Parsed they yield the SAME trees the staged
    * query spelling yields after its `hp`/`reg` aliases are inlined back
    * to scan attributes (`&` is left-associative; the shift is
    * parenthesized), which is what lets `semanticEquals` match the two. */
  def regSql(idSql: String): String = s"${hpExpr(idSql)} & 4095"

  def rhoSql(idSql: String): String = {
    val hp = s"(${hpExpr(idSql)})"
    s"""CASE WHEN ($hp >> 12) & 1099511627775 = 0 THEN 41
        ELSE 41 - length(bin(($hp >> 12) & 1099511627775)) END"""
  }

  /** (key..., reg, mrho) register rows → (key..., n_registers,
    * est_distinct): alpha·m²/Σ2^-M with the linear-counting small-range
    * branch, the Σ folded in register order. */
  def estimate(regs: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    regs.groupBy(kc: _*)
      .agg(count(lit(1)).as("n_present"),
        expr("""aggregate(
                  sort_array(collect_list(named_struct('reg', reg, 'mrho', mrho))),
                  CAST(0.0 AS DOUBLE),
                  (acc, x) -> acc + power(CAST(2.0 AS DOUBLE),
                                          -CAST(x.mrho AS DOUBLE)))""").as("s_present"))
      .withColumn("s", col("s_present") + (col("n_present") * -1 + 4096).cast("double"))
      .withColumn("raw",
        lit(0.7213 / (1.0 + 1.079 / 4096)) * lit(4096.0) * lit(4096.0) / col("s"))
      .withColumn("est_distinct", when(
        col("raw") <= lit(2.5) * lit(4096.0) && col("n_present") < 4096,
        lit(4096.0) * log(lit(4096.0) / (col("n_present") * -1 + 4096).cast("double")))
        .otherwise(col("raw")))
      .select(kc ++ Seq(col("n_present").cast("bigint").as("n_registers"),
        col("est_distinct")): _*)
  }

  /** Oracle-side register CTEs over a (keySql, idSql) relation — yields a
    * CTE body ending in `regs(key..., reg, mrho)`. */
  def oracleRegsCtes(keySql: String, idSql: String, from: String): String =
    s"""hsrc AS (
          SELECT $keySql,
                 md5_number_upper(CAST($idSql AS VARCHAR))
                   & 9223372036854775807 AS hp
          FROM $from),
        rsrc AS (
          SELECT $keySql, hp & 4095 AS reg,
                 CASE WHEN (hp >> 12) & 1099511627775 = 0 THEN 41
                      ELSE 41 - length(bin((hp >> 12) & 1099511627775)) END AS rho
          FROM hsrc),
        regs AS (SELECT $keySql, reg, MAX(rho) AS mrho
                 FROM rsrc GROUP BY $keySql, reg)"""

  /** Oracle-side estimator over `regs` — mirrors [[estimate]]. */
  def oracleEstimateCtes(keySql: String): String =
    s"""folded AS (
          SELECT $keySql, COUNT(*) AS n_present,
                 list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(list(mrho ORDER BY reg),
                     x -> power(CAST(2.0 AS DOUBLE), -CAST(x AS DOUBLE)))),
                   (a, b) -> a + b) AS s_present
          FROM regs GROUP BY $keySql),
        rawest AS (
          SELECT $keySql, n_present,
                 CAST(0.7213 AS DOUBLE)
                   / (CAST(1.0 AS DOUBLE)
                      + CAST(1.079 AS DOUBLE) / CAST(4096 AS DOUBLE))
                   * CAST(4096.0 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
                   / (s_present + CAST(n_present * -1 + 4096 AS DOUBLE)) AS raw
          FROM folded),
        hllest AS (
          SELECT $keySql, n_present,
                 CASE WHEN raw <= CAST(2.5 AS DOUBLE) * CAST(4096.0 AS DOUBLE)
                           AND n_present < 4096
                      THEN CAST(4096.0 AS DOUBLE)
                           * ln(CAST(4096.0 AS DOUBLE)
                                / CAST(n_present * -1 + 4096 AS DOUBLE))
                      ELSE raw END AS est_distinct
          FROM rawest)"""
}
