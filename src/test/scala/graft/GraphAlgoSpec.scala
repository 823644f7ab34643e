package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Hand-graph unit tests for the graph algorithm cores — the oracle checks
  * them end-to-end on the trade graph; these pin the algorithms' semantics
  * on graphs with known-by-inspection answers. */
class GraphAlgoSpec extends SparkSpec {

  test("degree-ordered triangle counting finds each triangle exactly once") {
    val s = spark
    import s.implicits._
    // A triangle {a,b,c} with a pendant path c—d—e, plus a disjoint K4 on
    // {p,q,r,s2}: K4 has 4 triangles, each node on 3 of them. Degrees are
    // deliberately non-uniform so the orientation tie-break is exercised.
    val und = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"),
      ("c", "d"), ("d", "e"),
      ("p", "q"), ("p", "r"), ("p", "s2"),
      ("q", "r"), ("q", "s2"), ("r", "s2")).toDF("a", "b")
    val nodes = Seq("a", "b", "c", "d", "e", "p", "q", "r", "s2").toDF("node")
    val got = Graph.triangleCounts(nodes, und)
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L, "e" -> 0L,
      "p" -> 3L, "q" -> 3L, "r" -> 3L, "s2" -> 3L))
  }

  test("triangle counts match naive enumeration on seeded pseudo-random graphs") {
    val s = spark
    import s.implicits._
    // Deterministic LCG edge sampling (no Math.random — keeps the spec
    // reproducible); three density regimes. Node names zero-padded so
    // lexicographic order == numeric order (canonical a < b edges).
    for ((n, p, seed) <- Seq((12, 0.3, 1L), (18, 0.2, 7L), (15, 0.5, 13L))) {
      var x = seed
      def next(): Double = {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 11).toDouble / (1L << 53).toDouble
      }
      val nodes = (0 until n).map(i => f"n$i%02d")
      val edges = for {
        a <- 0 until n; b <- a + 1 until n if next() < p
      } yield (nodes(a), nodes(b))
      val es = edges.toSet
      val perNode = Array.fill(n)(0L)
      for {
        i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n
        if es((nodes(i), nodes(j))) && es((nodes(i), nodes(k))) &&
          es((nodes(j), nodes(k)))
      } { perNode(i) += 1; perNode(j) += 1; perNode(k) += 1 }
      val got = Graph.triangleCounts(nodes.toDF("node"), edges.toDF("a", "b"))
        .as[(String, Long)].collect().toMap
      nodes.zipWithIndex.foreach { case (nm, i) =>
        assert(got(nm) === perNode(i), s"node $nm (n=$n, p=$p)")
      }
    }
  }

  test("sssp matches Floyd-Warshall on seeded pseudo-random weighted digraphs") {
    val s = spark
    import s.implicits._
    for ((n, p, seed) <- Seq((10, 0.3, 3L), (14, 0.25, 9L))) {
      var x = seed
      def next(): Double = {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 11).toDouble / (1L << 53).toDouble
      }
      val nodes = (0 until n).map(i => f"n$i%02d")
      val edges = for {
        a <- 0 until n; b <- 0 until n
        if a != b && { val keep = next() < p; keep }
      } yield (a, b, (next() * 9).toLong + 1)
      // Floyd-Warshall reference from source 0.
      val INF = Long.MaxValue / 4
      val d = Array.fill(n, n)(INF)
      (0 until n).foreach(i => d(i)(i) = 0)
      edges.foreach { case (a, b, c) => d(a)(b) = math.min(d(a)(b), c) }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        d(i)(j) = math.min(d(i)(j), d(i)(k) + d(k)(j))

      val dist0 = nodes.toDF("node").select($"node",
        when($"node" === nodes(0), lit(0L)).as("dd")).toDF("node", "d")
      val got = Graph.ssspRounds(dist0,
          edges.map { case (a, b, c) => (nodes(a), nodes(b), c) }
            .toDF("src", "dst", "cost"),
          rounds = n)
        .as[(String, Option[Long])].collect().toMap
      nodes.zipWithIndex.foreach { case (nm, i) =>
        val want = if (d(0)(i) >= INF) None else Some(d(0)(i))
        assert(got(nm) === want, s"node $nm (n=$n, p=$p)")
      }
    }
  }

  test("min-label propagation splits disjoint components; isolated node is its own") {
    val s = spark
    import s.implicits._
    // Components: a path a—b—c (min label a), a pair x—y (min x), and the
    // isolated node z. 8 rounds ≫ both diameters.
    val und = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("a", "b")
    val nodes = Seq("a", "b", "c", "x", "y", "z").toDF("node")
    val got = Graph.componentRounds(nodes, und, rounds = 8)
      .as[(String, String)].collect().toMap
    assert(got === Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("sssp relaxation rounds produce exact distances; unreachable stays null") {
    val s = spark
    import s.implicits._
    // s→a(1)→b(1)→c(1), a shortcut s→b(5) that must lose, a back edge
    // c→a(1) that must not improve anything, and an isolated node z.
    val edges = Seq(
      ("s", "a", 1L), ("a", "b", 1L), ("s", "b", 5L),
      ("b", "c", 1L), ("c", "a", 1L)).toDF("src", "dst", "cost")
    val nodes = Seq("s", "a", "b", "c", "z").toDF("node")
    val dist0 = nodes.select($"node", when($"node" === "s", lit(0L)).as("d"))
    val got = Graph.ssspRounds(dist0, edges, rounds = 6)
      .as[(String, Option[Long])].collect().toMap
    assert(got === Map(
      "s" -> Some(0L), "a" -> Some(1L), "b" -> Some(2L),
      "c" -> Some(3L), "z" -> None))
  }
}
