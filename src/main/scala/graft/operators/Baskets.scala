package graft.operators

import graft.api.{QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining (north-star addition — frequent-pair
  * analysis is the standard retail/recommendation primitive an analytics
  * engine is expected to ship).
  *
  * Scale shape: baskets (order item lists) are naturally BOUNDED — TPC-H
  * orders carry ≤ ~13 lines, real carts similarly — so per-basket pair
  * expansion is O(k²) with small constant k and the total pair stream is
  * linear in the fact table. The Spark side therefore aggregates baskets in
  * ONE shuffle on the order key and expands pairs MAP-SIDE with array HOFs
  * (no self-join: a join spelling would shuffle the fact table twice and
  * re-materialize it in the build hash map). The pair aggregation is the
  * second and final shuffle; top-k compiles to TakeOrderedAndProject, never
  * a global sort. The oracle uses the readable self-join spelling — same
  * multiset of pairs by construction.
  */
object Baskets extends QueryModule {

  /** (order, sorted distinct part list) — ONE shuffle on the order key.
    * `sort_array` pins the nondeterministic collect_set order so downstream
    * expansion is deterministic on any partitioning. Every basket statistic
    * (pairs, item supports, order count) derives from this frame; repeated
    * references share the exchange (AQE stage reuse), so lineitem is
    * scanned and shuffled exactly once per query. */
  def baskets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_partkey")
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("items"))
  }

  /** Exploded canonical pairs p1 < p2 from [[baskets]]. */
  def pairStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    baskets(s, dir)
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
             transform(slice(items, i + 2, size(items)), y ->
               struct(x AS p1, y AS p2))))""")).as("pr"))
      .select($"pr.p1", $"pr.p2")
  }

  def queries: Map[String, QuerySpec] = Map(
    // Top co-occurring part pairs by raw support, fully tie-broken.
    "rel_basket_pairs" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        pairStream(s, dir)
          .groupBy($"p1", $"p2").agg(count(lit(1)).as("support"))
          .orderBy($"support".desc, $"p1", $"p2")
          .limit(100)
      },
      oracle = Some("""
        SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS support
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY support DESC, p1, p2 LIMIT 100""")),

    // Association strength: lift = P(p1,p2) / (P(p1)·P(p2)) over order
    // baskets, for pairs seen at least twice. Item supports are a bounded
    // dimension (|parts|), broadcast to the pair stream; the scalar order
    // count broadcasts as a single-row literal. All inputs to the double
    // division are exact integers, so both engines compute the identical
    // IEEE result and the lift ranking is bit-stable.
    "rel_basket_lift" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        // All three statistics derive from the ONE basket aggregate: the
        // old spelling re-scanned lineitem and paid a separate
        // distinct(l_orderkey, l_partkey) shuffle plus an l_orderkey
        // distinct for the order count. Here the order count is the basket
        // row count, item supports explode the (already distinct) basket
        // items, and the shared groupBy(l_orderkey) exchange is reused by
        // all three consumers — one lineitem scan, one full-width shuffle
        // fewer. Identical values by construction (collect_set dedups
        // exactly what distinct() dedup'd).
        val b = baskets(s, dir)
        val nOrders = b.agg(count(lit(1)).as("n_orders"))
        val itemCnt = b.select(explode($"items").as("l_partkey"))
          .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
        val pairs = b
          .select(explode(expr(
            """flatten(transform(items, (x, i) ->
                 transform(slice(items, i + 2, size(items)), y ->
                   struct(x AS p1, y AS p2))))""")).as("pr"))
          .select($"pr.p1", $"pr.p2")
          .groupBy($"p1", $"p2").agg(count(lit(1)).as("pair_cnt"))
          .filter($"pair_cnt" >= 2)
        pairs
          .join(broadcast(itemCnt.select($"l_partkey".as("p1"), $"cnt".as("c1"))), "p1")
          .join(broadcast(itemCnt.select($"l_partkey".as("p2"), $"cnt".as("c2"))), "p2")
          .crossJoin(broadcast(nOrders))
          .select($"p1", $"p2", $"pair_cnt",
            ($"pair_cnt".cast("double") * $"n_orders".cast("double") /
              ($"c1".cast("double") * $"c2".cast("double"))).as("lift"))
          .orderBy($"lift".desc, $"p1", $"p2")
          .limit(50)
      },
      oracle = Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
        item AS (SELECT l_partkey, COUNT(*) AS cnt FROM li GROUP BY 1),
        pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_cnt
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        SELECT p1, p2, pair_cnt,
               CAST(pair_cnt AS DOUBLE) * CAST(n_orders AS DOUBLE) /
                 (CAST(i1.cnt AS DOUBLE) * CAST(i2.cnt AS DOUBLE)) AS lift
        FROM pairs
        JOIN item i1 ON i1.l_partkey = p1
        JOIN item i2 ON i2.l_partkey = p2
        CROSS JOIN n
        ORDER BY lift DESC, p1, p2 LIMIT 50"""))
  )
}
