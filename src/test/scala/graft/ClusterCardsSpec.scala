package graft

import graft.llm.Embeddings
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Invariants for the per-cluster dataset cards beyond the DuckDB hash
  * gate: the report partitions the corpus, ranks are dense, and every
  * cluster's top term is genuinely over-represented (max lift >= 1 is a
  * theorem: cluster shares sum to 1 while the matching corpus shares sum
  * to <= 1, so some term's ratio is >= 1). */
class ClusterCardsSpec extends SparkSpec {

  test("cluster cards: sizes partition the corpus, dense top-5 ranks, top lift >= 1") {
    val out = Embeddings.queries("llm_cluster_cards").fn(spark, sfDir).cache()
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getInt(3), r.getString(4), r.getLong(5), r.getDouble(6)))
    val byCluster = rows.groupBy(_._1)
    assert(byCluster.size === 8, "k = 8 seed clusters")
    // n_docs is constant within a cluster and sums to the corpus size.
    byCluster.values.foreach(g => assert(g.map(_._2).distinct.length === 1))
    val total = byCluster.values.map(_.head._2).sum
    assert(total === Tables.load(spark, sfDir, "embeddings").count())
    // Ranks are dense 1..5, cohesion and lift are sane, top lift >= 1.
    byCluster.values.foreach { g =>
      assert(g.map(_._4).sorted.sameElements(1 to g.length) && g.length <= 5)
      assert(g.forall(x => x._3 >= 0.0 && x._7 > 0.0 && x._6 > 0L))
      assert(g.minBy(_._4)._7 >= 1.0, "a cluster's top term must be over-represented")
    }
    out.unpersist()
  }
}
