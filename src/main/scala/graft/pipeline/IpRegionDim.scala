package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic IP→region dimension (764 rows).
  *
  * The reference builds this map with the 7 fixed entries at
  * `00_utils.py:42-48` plus unseeded `random.choice` for the rest
  * (`00_utils.py:49-51`) — i.e. it differs per process. The engine fixes
  * the declared semantics (SURVEY §2.9 note): the 7 hand-written entries
  * are preserved verbatim; every other IP picks deterministically from the
  * same candidate list the reference used, indexed by last-octet mod 3.
  * `192.168.1.0` is absent from the reference map and therefore resolves
  * to 'Unknown' downstream.
  *
  * Bounded at 764 rows forever → always broadcast-joinable.
  */
object IpRegionDim {

  private val fixed: Map[Int, String] = Map(
    1 -> "North America", 2 -> "North America", 3 -> "Europe", 4 -> "Asia",
    5 -> "South America", 6 -> "Africa", 7 -> "Oceania")

  private val subnetA = Seq("North America", "Europe", "Asia")          // 192.168.1.8-254
  private val subnetB = Seq("Europe", "Asia", "North America")          // 10.0.0.0-254
  private val subnetC = Seq("South America", "Africa", "Oceania")       // 172.16.0.0-254

  /** All (ip, geo_region) pairs. */
  val entries: Seq[(String, String)] =
    (1 to 254).map(i =>
      s"192.168.1.$i" -> fixed.getOrElse(i, subnetA(i % 3))) ++
      (0 to 254).map(i => s"10.0.0.$i" -> subnetB(i % 3)) ++
      (0 to 254).map(i => s"172.16.0.$i" -> subnetC(i % 3))

  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("ip", "geo_region")
  }

  /** The identical dimension as a DuckDB-SQL inline relation, for oracle
    * queries (list indexing in DuckDB is 1-based, hence `% 3 + 1`). */
  val oracleSql: String = """
    SELECT '192.168.1.' || CAST(i AS VARCHAR) AS ip,
           CASE WHEN i IN (1, 2) THEN 'North America'
                WHEN i = 3 THEN 'Europe'
                WHEN i = 4 THEN 'Asia'
                WHEN i = 5 THEN 'South America'
                WHEN i = 6 THEN 'Africa'
                WHEN i = 7 THEN 'Oceania'
                ELSE ['North America', 'Europe', 'Asia'][(i % 3) + 1]
           END AS geo_region
    FROM range(1, 255) t(i)
    UNION ALL
    SELECT '10.0.0.' || CAST(i AS VARCHAR),
           ['Europe', 'Asia', 'North America'][(i % 3) + 1]
    FROM range(0, 255) t(i)
    UNION ALL
    SELECT '172.16.0.' || CAST(i AS VARCHAR),
           ['South America', 'Africa', 'Oceania'][(i % 3) + 1]
    FROM range(0, 255) t(i)"""
}
