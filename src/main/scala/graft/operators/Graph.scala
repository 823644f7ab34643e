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

  import Exact.{sqlSum, sqlAvg}

  private val damping = 0.85
  private val rounds  = 5

  /** Iterative frames reference the previous round's frame TWICE (once to
    * carry state, once to relax/propagate), so the logical plan is a DAG
    * Catalyst traverses as a TREE — analysis cost doubles per round and a
    * ~20-round loop hangs in the planner long before any data moves. Same
    * cure as [[graft.llm.Dedup]]'s label loop: truncate lineage with an
    * eager checkpoint every few rounds (cluster-visible dir via
    * [[graft.api.Checkpoints]]). Integer/decimal-exact rounds mean the
    * checkpoint changes nothing observable. */
  private val truncateEvery = 4
  private def maybeCheckpoint(df: DataFrame, round: Int, rounds: Int): DataFrame =
    if (round % truncateEvery == 0 && round < rounds) checkpointed(df) else df

  /** Eagerly checkpoint a frame the loop (or the wedge join) will
    * reference many times: the lineage tree duplicates per reference and
    * Spark re-executes each occurrence (ReusedExchange catches only
    * identical exchange subtrees), so an expensive input like the 5-way
    * trade-edge join must be materialized ONCE — measured 22 s → ~2 s on
    * the components query at sf0.1. O(|edges|) storage, exactly what a
    * cluster run would persist across rounds anyway. */
  private def checkpointed(df: DataFrame): DataFrame = {
    graft.api.Checkpoints.ensureDir(df.sparkSession)
    df.checkpoint(eager = true)
  }

  /** Bellman-Ford relaxation rounds (single-source shortest path).
    * `dist` = (node, d: bigint nullable — null is +infinity), `edges` =
    * (src, dst, cost: bigint). Each round is ONE shuffle (the union's
    * min-aggregate on node); state stays O(|nodes|). Integer costs make
    * every round bit-exact on any partitioning. */
  def ssspRounds(dist0: DataFrame, edges0: DataFrame, rounds: Int): DataFrame = {
    val edges = checkpointed(edges0)
    var dist = dist0
    for (r <- 1 to rounds) {
      val relaxed = edges
        .join(dist.filter(col("d").isNotNull), col("src") === col("node"))
        .select(col("dst").as("node"), (col("d") + col("cost")).as("d"))
      dist = dist.select(col("node"), col("d")).union(relaxed)
        .groupBy(col("node")).agg(min(col("d")).as("d"))
      dist = maybeCheckpoint(dist, r, rounds)
    }
    dist
  }

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

  /** Degree-ordered triangle counting (Suri–Vassilvitskii). `und` =
    * canonical undirected edges (a < b, distinct); `nodes` = (node). Each
    * edge is oriented from its lower-(degree, id) endpoint to the higher,
    * wedges are built only within oriented out-neighborhoods, and closed
    * against the oriented edge set — every triangle found exactly once,
    * with wedge count bounded by sum(out-deg²), out-degrees ≲ sqrt(|E|).
    * Returns (node, n_tri) including zero-triangle nodes. */
  def triangleCounts(nodes: DataFrame, und0: DataFrame): DataFrame = {
    // und feeds the degree agg AND both sides of the wedge closure;
    // oriented is referenced three times — materialize each once.
    val und = checkpointed(und0)
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = checkpointed(withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u"), col("e.v"), col("e.dv")))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tris = wedges.join(oriented.as("e3"),
      col("y") === col("e3.u") && col("z") === col("e3.v"))
      .select(col("x"), col("y"), col("z"))
    val perNode = tris.select(col("x").as("m")).union(tris.select(col("y").as("m")))
      .union(tris.select(col("z").as("m")))
    nodes.join(perNode, col("node") === col("m"), "left")
      .groupBy(col("node")).agg(count(col("m")).as("n_tri"))
  }

  /** Min-label propagation rounds (weakly connected components). `und` =
    * canonical undirected edges (a, b); labels start as each node's own id
    * and each round takes the min over {self} ∪ neighbors — one shuffle
    * per round, O(|nodes|) state, exactly the machinery behind
    * [[graft.llm.Dedup]]'s duplicate clusters, exposed as a graph op. */
  def componentRounds(nodes: DataFrame, und0: DataFrame, rounds: Int): DataFrame = {
    val und = checkpointed(und0)
    val edges = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
    var lab = nodes.select(col("node"), col("node").as("label"))
    for (r <- 1 to rounds) {
      val nb = edges.join(lab, col("src") === col("node"))
        .select(col("dst").as("node"), col("label"))
      lab = lab.select(col("node"), col("label")).union(nb)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
      lab = maybeCheckpoint(lab, r, rounds)
    }
    lab
  }

  /** Directed nation→nation trade edges with exact-decimal volume weights:
    * the TPC-H Q7 join shape, unfiltered. Facts shuffle on their keys; the
    * two nation maps broadcast. Columns: (src_nk, dst_nk, src, dst, w). */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Dim-reduction shape (the rel_q7 lesson, measured at sf100): fold
    // each nation into its OWN side before the fact joins. supplier+nation
    // collapses to a broadcastable 2-column map; the customer nation rides
    // orders as (o_orderkey, src_nk, src); lineitem then shuffles ONCE, on
    // l_orderkey — the naive chain re-shuffled the full-width 600M-row
    // intermediate on o_custkey and l_suppkey as well.
    val nation   = Tables.load(s, dir, "nation")
    val cn = nation.select($"n_nationkey".as("c_nk"), $"n_name".as("src"))
    val sn = nation.select($"n_nationkey".as("s_nk"), $"n_name".as("dst"))
    val suppSide = broadcast(
      Tables.load(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
        .join(broadcast(sn), $"s_nationkey" === $"s_nk")
        .select($"s_suppkey", $"s_nk", $"dst"))
    val ordSide = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(
        Tables.load(s, dir, "customer").select($"c_custkey", $"c_nationkey")
          .join(broadcast(cn), $"c_nationkey" === $"c_nk")
          .select($"c_custkey", $"c_nk", $"src"),
        $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_nk", $"src")
    Tables.load(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(suppSide, $"l_suppkey" === $"s_suppkey")
      .join(ordSide, $"l_orderkey" === $"o_orderkey")
      .groupBy($"c_nk".as("src_nk"), $"s_nk".as("dst_nk"), $"src", $"dst")
      .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
        .cast(DecimalType(30, 6))).cast("double").as("w"))
  }

  private def nationNodes(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "nation").select(col("n_name").as("node"))

  /** Strong-trade undirected edges: both directions of [[tradeEdges]]
    * summed, kept when the weight exceeds the global mean — a self-scaling
    * threshold, so the subgraph stays nontrivial at every SF. Returns
    * canonical (a < b) edge pairs. */
  private def strongEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val und = tradeEdges(s, dir)
      .filter($"src" =!= $"dst")
      .groupBy(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .agg(sum($"w".cast(DecimalType(30, 6))).cast("double").as("w"))
    val thr = und.agg((sum($"w".cast(DecimalType(30, 6))).cast("double") /
      count($"w")).as("t"))
    und.crossJoin(broadcast(thr)).filter($"w" > $"t").select($"a", $"b")
  }

  /** Oracle-side spelling of [[strongEdges]] (WITH-clause fragment ending
    * in `keep(a, b)`). */
  private lazy val strongEdgesSql = s"""dir_edges AS ($tradeEdgesSql),
        und AS (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
                 ${sqlSum("w")} AS w
          FROM dir_edges WHERE src <> dst GROUP BY 1, 2),
        thr AS (SELECT ${sqlAvg("w")} AS t FROM und),
        keep AS (SELECT a, b FROM und, thr WHERE w > t)"""

  /** Oracle-side spelling of [[tradeEdges]]. */
  private val tradeEdgesSql = s"""
        SELECT cn.n_nationkey AS src_nk, sn.n_nationkey AS dst_nk,
               cn.n_name AS src, sn.n_name AS dst,
               ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS w
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        GROUP BY 1, 2, 3, 4"""

  def queries: Map[String, QuerySpec] = Map(
    // k-core decomposition (k = 3, iterative peeling): repeatedly drop
    // nodes whose degree among the SURVIVORS is < k; what remains is the
    // maximal subgraph where everyone has ≥ k in-core neighbors — the
    // standard community-density screen (and the classic "which suppliers/
    // customers sit in a robust trade cluster" question on this graph).
    // Peeling is the same bounded-iteration discipline as the other graph
    // ops: each round is one edge⋈live semi-restriction + one degree
    // aggregate (O(edges) work, O(nodes) state), lineage cut on the
    // componentRounds checkpoint cadence; 8 rounds reach fixpoint on any
    // graph this size, and extra rounds past fixpoint are exact no-ops in
    // BOTH engines, so the unrolled-CTE oracle checks the iteration
    // round-for-round. Output is each core member with its in-core degree.
    "rel_graph_kcore" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val und = checkpointed(strongEdges(s, dir))
        val edges = und.select($"a".as("src"), $"b".as("dst"))
          .union(und.select($"b".as("src"), $"a".as("dst")))
        var live = edges.select($"src".as("node")).distinct()
        for (r <- 1 to 8) {
          live = edges
            .join(live.select($"node".as("src")), "src")
            .join(live.select($"node".as("dst")), "dst")
            .groupBy($"src").agg(count(lit(1)).as("d"))
            .filter($"d" >= 3).select($"src".as("node"))
          live = maybeCheckpoint(live, r, 8)
        }
        edges
          .join(live.select($"node".as("src")), "src")
          .join(live.select($"node".as("dst")), "dst")
          .groupBy($"src".as("node")).agg(count(lit(1)).as("core_degree"))
      },
      oracle = {
        val rounds = (1 to 8).map { r =>
          s"""
        live$r AS MATERIALIZED (
          SELECT src AS node FROM uedges
          JOIN live${r - 1} la ON uedges.src = la.node
          JOIN live${r - 1} lb ON uedges.dst = lb.node
          GROUP BY src HAVING COUNT(*) >= 3)"""
        }.mkString(",")
        Some(s"""
        WITH $strongEdgesSql,
        uedges AS MATERIALIZED (SELECT a AS src, b AS dst FROM keep
                UNION ALL SELECT b AS src, a AS dst FROM keep),
        live0 AS (SELECT DISTINCT src AS node FROM uedges),
        $rounds
        SELECT src AS node, COUNT(*) AS core_degree FROM uedges
        JOIN live8 la ON uedges.src = la.node
        JOIN live8 lb ON uedges.dst = lb.node
        GROUP BY src""")
      }),

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
      }),

    // ------------------------------------------------------------------
    // Triangle counting on the strong-trade graph — the fraud-ring /
    // community-density primitive. Undirected edges = both directions of
    // the nation trade graph summed; "strong" = weight above the global
    // mean (self-scaling threshold, so the subgraph stays nontrivial at
    // every SF). The Spark side runs the DEGREE-ORDERED algorithm
    // (Suri–Vassilvitskii): orient each edge from its lower-(degree, name)
    // endpoint to the higher, build wedges only from each node's oriented
    // out-neighborhood, and close them against the oriented edge set. At
    // 100 TB this bounds the wedge count by sum(out-deg²) with out-degrees
    // capped near sqrt(|E|) — the all-pairs-per-node blowup on hub nodes
    // never happens. Each triangle is counted exactly once, so the simple
    // lexicographic SQL spelling in the oracle enumerates the identical
    // set. Two shuffles (degree agg + wedge join); weights exact decimal.
    "rel_graph_triangles" -> QuerySpec(
      fn = (s, dir) =>
        triangleCounts(nationNodes(s, dir), strongEdges(s, dir)),
      oracle = Some(s"""
        WITH $strongEdgesSql,
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM keep e1
          JOIN keep e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN keep e3 ON e3.a = e1.b AND e3.b = e2.b),
        per_node AS (
          SELECT x AS m FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        SELECT n.n_name AS node, COUNT(p.m) AS n_tri
        FROM nation n LEFT JOIN per_node p ON p.m = n.n_name
        GROUP BY 1""")),

    // ------------------------------------------------------------------
    // Single-source shortest path: Bellman-Ford relaxation rounds over the
    // directed trade graph with deterministic integer edge costs (derived
    // from the endpoint keys, so both engines agree bit-for-bit with no
    // float discipline needed). One shuffle per round, O(|nodes|) state —
    // the same iterate-a-join shape as pagerank, so the 100 TB story is
    // identical (persist + reliable checkpoint every few rounds). 8 rounds
    // far exceeds the 25-node graph's diameter; the oracle unrolls the
    // SAME 8 relaxations as CTEs, so the results match even before
    // convergence arguments enter.
    "rel_graph_sssp" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val edges = tradeEdges(s, dir)
          .filter($"src_nk" =!= $"dst_nk")
          .select($"src", $"dst",
            (($"src_nk" * 7 + $"dst_nk" * 13) % 20 + 1).cast("long").as("cost"))
        val nodes = Tables.load(s, dir, "nation")
          .select($"n_name".as("node"), $"n_nationkey")
        val dist0 = nodes.select($"node",
          when($"n_nationkey" === 0, lit(0L)).as("d"))
        ssspRounds(dist0, edges, rounds = 8)
          .select($"node", $"d".as("dist"))
      },
      oracle = {
        val base = s"""
        WITH dir_edges AS ($tradeEdgesSql),
        edges AS (
          SELECT src, dst,
                 CAST((src_nk * 7 + dst_nk * 13) % 20 + 1 AS BIGINT) AS cost
          FROM dir_edges WHERE src_nk <> dst_nk),
        nodes AS (SELECT n_name AS node, n_nationkey FROM nation),
        d0 AS (SELECT node, CASE WHEN n_nationkey = 0
                 THEN CAST(0 AS BIGINT) END AS d FROM nodes)"""
        val iters = (1 to 8).map { k =>
          s"""
        d$k AS (
          SELECT node, MIN(d) AS d FROM (
            SELECT node, d FROM d${k - 1}
            UNION ALL
            SELECT e.dst AS node, p.d + e.cost AS d
            FROM edges e JOIN d${k - 1} p ON e.src = p.node
            WHERE p.d IS NOT NULL) u
          GROUP BY node)"""
        }.mkString(",")
        Some(s"""$base,$iters
        SELECT node, d AS dist FROM d8""")
      }),

    // ------------------------------------------------------------------
    // Weakly connected components of the strong-trade subgraph: min-label
    // propagation, the same iterate-a-join core that labels duplicate
    // clusters in the dedup pipeline, run here on a graph whose threshold
    // filter genuinely fragments it. 8 rounds unrolled identically in the
    // oracle, so results agree even before the convergence argument; at
    // 100 TB the loop gets persist + reliable checkpoints every few rounds
    // (Dedup.labels machinery) and large-star/small-star contraction if
    // diameters blow up. Component id = lexicographic min node name.
    "rel_graph_components" -> QuerySpec(
      fn = (s, dir) =>
        componentRounds(nationNodes(s, dir), strongEdges(s, dir), rounds = 8)
          .select(col("node"), col("label").as("component")),
      oracle = {
        val base = s"""
        WITH $strongEdgesSql,
        bidir AS (
          SELECT a AS src, b AS dst FROM keep
          UNION ALL SELECT b, a FROM keep),
        nodes AS (SELECT n_name AS node FROM nation),
        l0 AS (SELECT node, node AS label FROM nodes)"""
        val iters = (1 to 8).map { k =>
          s"""
        l$k AS (
          SELECT node, MIN(label) AS label FROM (
            SELECT node, label FROM l${k - 1}
            UNION ALL
            SELECT e.dst AS node, p.label
            FROM bidir e JOIN l${k - 1} p ON e.src = p.node) u
          GROUP BY node)"""
        }.mkString(",")
        Some(s"""$base,$iters
        SELECT node, label AS component FROM l8""")
      })
  )
}
