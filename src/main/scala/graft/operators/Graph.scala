package graft.operators

import graft.api.{Exact, QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over relations (north-star addition — the reference has
  * no graph surface, but a 100 TB analytics engine needs the iterate-a-join
  * pattern for entity graphs: influence ranking, fraud rings, supply
  * chains).
  *
  * The trade graph: an edge cust-nation → supp-nation weighted by the
  * discounted volume that flowed between them (the TPC-H Q7 join shape,
  * unfiltered). PageRank then runs as k chained {ranks ⋈ edges → aggregate}
  * rounds — each round is ONE shuffle on the destination key, and the rank
  * state is O(|nodes|), never materializing paths. This is exactly the
  * distributed shape that scales: at 10⁹ nodes the same loop runs with the
  * ranks DataFrame persisted + reliably checkpointed every few rounds (see
  * [[graft.llm.Dedup.clusters]] for that machinery); at 25 nodes Catalyst
  * simply broadcasts the rank side of every round.
  *
  * Numeric discipline: per-round contributions are summed in exact DECIMAL
  * (order-independent across partitionings), edge normalization and the
  * damping update are single double expressions written identically in the
  * oracle — ranks stay bit-identical through all rounds.
  */
object Graph extends QueryModule {

  import Exact.sqlSum

  private val damping = 0.85
  private val rounds  = 5

  /** The rank loop, reusable (query + scale soak): `nodes` = (node),
    * `norm` = (src, dst, wn) out-normalized edges. One shuffle per round on
    * the destination key, O(|nodes|) state, decimal-exact contributions —
    * identical results on any partitioning. */
  def pageRankRounds(nodes: DataFrame, norm: DataFrame,
      nNodes: Double, rounds: Int): DataFrame = {
    var ranks: DataFrame = nodes.withColumn("r", lit(1.0) / nNodes)
    for (_ <- 1 to rounds) {
      val contrib = norm.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("r") * col("wn")).as("c"))
      ranks = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .groupBy(col("node"))
        .agg((lit(1.0 - damping) / nNodes + lit(damping) *
          coalesce(sum(col("c").cast(DecimalType(30, 6))).cast("double"), lit(0.0)))
          .as("r"))
    }
    ranks
  }

  def queries: Map[String, QuerySpec] = Map(
    "rel_graph_pagerank" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val nation   = Tables.load(s, dir, "nation")
        val customer = Tables.load(s, dir, "customer")
        val supplier = Tables.load(s, dir, "supplier")
        val orders   = Tables.load(s, dir, "orders")
        val lineitem = Tables.load(s, dir, "lineitem")

        val cn = nation.select($"n_nationkey".as("c_nk"), $"n_name".as("src"))
        val sn = nation.select($"n_nationkey".as("s_nk"), $"n_name".as("dst"))
        // Edge build: the big fact joins shuffle on their keys; the two
        // nation maps broadcast. Weight summed in decimal.
        val edges = lineitem
          .join(orders.select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
          .join(customer.select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
          .join(supplier.select($"s_suppkey", $"s_nationkey"), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(cn), $"c_nationkey" === $"c_nk")
          .join(broadcast(sn), $"s_nationkey" === $"s_nk")
          .groupBy($"src", $"dst")
          .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast(DecimalType(30, 6))).cast("double").as("w"))
        val out = edges.groupBy($"src")
          .agg(sum($"w".cast(DecimalType(30, 6))).cast("double").as("outw"))
        val norm = edges.join(out, "src")
          .select($"src", $"dst", ($"w" / $"outw").as("wn"))

        val nodes = nation.select($"n_name".as("node"))
        pageRankRounds(nodes, norm, nNodes = 25.0, rounds = rounds)
          .select($"node", round($"r", 10).as("rank"))
      },
      oracle = {
        val base = s"""
        WITH edges AS (
          SELECT cn.n_name AS src, sn.n_name AS dst,
                 ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS w
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation cn ON c_nationkey = cn.n_nationkey
          JOIN nation sn ON s_nationkey = sn.n_nationkey
          GROUP BY 1, 2),
        outw AS (SELECT src, ${sqlSum("w")} AS outw FROM edges GROUP BY src),
        norm AS (SELECT src, dst, w / outw AS wn
                 FROM edges JOIN outw USING (src)),
        nodes AS (SELECT n_name AS node FROM nation),
        r0 AS (SELECT node, 1.0 / 25.0 AS r FROM nodes)"""
        val iters = (1 to rounds).map { k =>
          s"""
        r$k AS (
          SELECT n.node,
                 (1.0 - $damping) / 25.0 + $damping * COALESCE(
                   ${sqlSum("p.r * e.wn")}, 0.0) AS r
          FROM nodes n
          LEFT JOIN (norm e JOIN r${k - 1} p ON e.src = p.node)
            ON e.dst = n.node
          GROUP BY n.node)"""
        }.mkString(",")
        Some(s"""$base,$iters
        SELECT node, ROUND(r, 10) AS rank FROM r$rounds""")
      })
  )
}
