package graft.operators

import graft.api.{QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial primitives (north-star addition): haversine distance and a
  * grid-bucketed spatial nearest-neighbor join.
  *
  * Coordinates are derived DETERMINISTICALLY from entity keys as scaled
  * integers (hundredths of a degree), so both engines start from identical
  * doubles and — more importantly — the JOIN KEY is pure integer math: a
  * 10°×10° grid cell id computed by integer division. Membership in the
  * candidate set is therefore bit-exact across engines; floating point only
  * enters in the final distance ranking, where inputs are identical doubles
  * on both sides.
  *
  * Scale shape: the naive spatial join is all-pairs. Grid bucketing makes
  * it an EQUI-join: each supplier is replicated to its 3×3 cell
  * neighborhood map-side (bounded 9× expansion of the SMALL side; the
  * longitude cell wraps mod 36 so the ±180° antimeridian seam is adjacent,
  * mirrored in the oracle as modular cell distance), then a
  * plain hash join on (cell_lat, cell_lon) bounds candidates to points in
  * adjacent cells — at 100 TB this is the standard spatial-bin join, with
  * cell size tuned so a neighborhood holds O(1) candidates. The dimension
  * side broadcasts; the fact side never shuffles. The oracle spells the
  * same neighborhood as integer inequality — identical pair set.
  */
object Geo extends QueryModule {

  /** Great-circle distance (km) between (lat1,lon1) and (lat2,lon2) in
    * degrees — the haversine formula, with the asin argument clamped
    * against rounding drift past 1.0. Written operation-for-operation like
    * the oracle spelling so both engines evaluate the identical IEEE
    * expression tree. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    lit(2.0) * lit(6371.0) * asin(least(lit(1.0), sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), 2))))

  private val haversineSql =
    """2.0 * 6371.0 * ASIN(LEAST(1.0, SQRT(
         POW(SIN(RADIANS(%LAT2% - %LAT1%) / 2), 2) +
         COS(RADIANS(%LAT1%)) * COS(RADIANS(%LAT2%)) *
         POW(SIN(RADIANS(%LON2% - %LON1%) / 2), 2))))"""

  private def hsql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    haversineSql.replace("%LAT1%", lat1).replace("%LON1%", lon1)
      .replace("%LAT2%", lat2).replace("%LON2%", lon2)

  def queries: Map[String, QuerySpec] = Map(
    // Nearest supplier per customer within the 3×3 grid neighborhood:
    // integer-exact candidate generation, haversine ranking, deterministic
    // tie-break on the supplier key.
    "rel_geo_nearest" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val cust = Tables.load(s, dir, "customer")
          .select($"c_custkey",
            ($"c_custkey" * 7919 % 18000).as("cla"),
            ($"c_custkey" * 104729 % 36000).as("clo"))
          .withColumn("cell_lat", expr("cla div 1000"))
          .withColumn("cell_lon", expr("clo div 1000"))
        val supp = Tables.load(s, dir, "supplier")
          .select($"s_suppkey",
            ($"s_suppkey" * 4099 % 18000).as("sla"),
            ($"s_suppkey" * 9973 % 36000).as("slo"))
        // Replicate each supplier to its 3×3 neighborhood (bounded 9× on
        // the small side), making the spatial predicate an equi-join.
        val supp9 = supp
          .withColumn("dl", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dn", explode(array(lit(-1), lit(0), lit(1))))
          .select($"s_suppkey", $"sla", $"slo",
            (expr("sla div 1000") + $"dl").as("cell_lat"),
            ((expr("slo div 1000") + $"dn" + 36) % 36).as("cell_lon"))
        cust.join(broadcast(supp9), Seq("cell_lat", "cell_lon"))
          .withColumn("d", haversineKm(
            $"cla" / 100.0 - 90.0, $"clo" / 100.0 - 180.0,
            $"sla" / 100.0 - 90.0, $"slo" / 100.0 - 180.0))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"c_custkey").orderBy($"d", $"s_suppkey")))
          .filter($"rn" === 1)
          .select($"c_custkey", $"s_suppkey", round($"d", 4).as("dist_km"))
      },
      oracle = Some(s"""
        WITH c AS (
          SELECT c_custkey, c_custkey * 7919 % 18000 AS cla,
                 c_custkey * 104729 % 36000 AS clo
          FROM customer),
        s AS (
          SELECT s_suppkey, s_suppkey * 4099 % 18000 AS sla,
                 s_suppkey * 9973 % 36000 AS slo
          FROM supplier),
        cand AS (
          SELECT c.c_custkey, s.s_suppkey,
                 ${hsql("(cla / 100.0 - 90.0)", "(clo / 100.0 - 180.0)",
                        "(sla / 100.0 - 90.0)", "(slo / 100.0 - 180.0)")} AS d
          FROM c JOIN s
            ON abs(cla // 1000 - sla // 1000) <= 1
           AND least(abs(clo // 1000 - slo // 1000),
                     36 - abs(clo // 1000 - slo // 1000)) <= 1),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY d, s_suppkey) AS rn
          FROM cand)
        SELECT c_custkey, s_suppkey, ROUND(d, 4) AS dist_km
        FROM ranked WHERE rn = 1""")),

    // Spatial k-NN (k = 3) within the same neighborhood — the ranked
    // variant of rel_geo_nearest: same integer-exact candidate join, the
    // window keeps the 3 closest suppliers with their ranks.
    "rel_geo_knn" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val cust = Tables.load(s, dir, "customer")
          .select($"c_custkey",
            ($"c_custkey" * 7919 % 18000).as("cla"),
            ($"c_custkey" * 104729 % 36000).as("clo"))
          .withColumn("cell_lat", expr("cla div 1000"))
          .withColumn("cell_lon", expr("clo div 1000"))
        val supp = Tables.load(s, dir, "supplier")
          .select($"s_suppkey",
            ($"s_suppkey" * 4099 % 18000).as("sla"),
            ($"s_suppkey" * 9973 % 36000).as("slo"))
        val supp9 = supp
          .withColumn("dl", explode(array(lit(-1), lit(0), lit(1))))
          .withColumn("dn", explode(array(lit(-1), lit(0), lit(1))))
          .select($"s_suppkey", $"sla", $"slo",
            (expr("sla div 1000") + $"dl").as("cell_lat"),
            ((expr("slo div 1000") + $"dn" + 36) % 36).as("cell_lon"))
        cust.join(broadcast(supp9), Seq("cell_lat", "cell_lon"))
          .withColumn("d", haversineKm(
            $"cla" / 100.0 - 90.0, $"clo" / 100.0 - 180.0,
            $"sla" / 100.0 - 90.0, $"slo" / 100.0 - 180.0))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy($"c_custkey").orderBy($"d", $"s_suppkey")))
          .filter($"rank" <= 3)
          .select($"c_custkey", $"rank", $"s_suppkey", round($"d", 4).as("dist_km"))
      },
      oracle = Some(s"""
        WITH c AS (
          SELECT c_custkey, c_custkey * 7919 % 18000 AS cla,
                 c_custkey * 104729 % 36000 AS clo
          FROM customer),
        s AS (
          SELECT s_suppkey, s_suppkey * 4099 % 18000 AS sla,
                 s_suppkey * 9973 % 36000 AS slo
          FROM supplier),
        cand AS (
          SELECT c.c_custkey, s.s_suppkey,
                 ${hsql("(cla / 100.0 - 90.0)", "(clo / 100.0 - 180.0)",
                        "(sla / 100.0 - 90.0)", "(slo / 100.0 - 180.0)")} AS d
          FROM c JOIN s
            ON abs(cla // 1000 - sla // 1000) <= 1
           AND least(abs(clo // 1000 - slo // 1000),
                     36 - abs(clo // 1000 - slo // 1000)) <= 1),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY c_custkey ORDER BY d, s_suppkey) AS rank
          FROM cand)
        SELECT c_custkey, CAST(rank AS INT) AS rank, s_suppkey,
               ROUND(d, 4) AS dist_km
        FROM ranked WHERE rank <= 3"""))
  )
}
