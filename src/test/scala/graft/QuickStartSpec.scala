package graft

/** The README quick-start, kept compiling and running against the PUBLIC
  * API only — `graft.Graft`, `graft.llm.Dedup`, `graft.plans.AsofJoin` —
  * so the five representative calls a new user copies are verified, not
  * aspirational. */
class QuickStartSpec extends SparkSpec {

  test("the five README quick-start calls run against the public API") {
    // 1. Session: SparkSpec already holds one built by the same factory;
    //    assert the front door hands back the active session with the
    //    native functions installed (SQL-visible).
    val s = Graft.session("quickstart")
    assert(s eq spark, "Graft.session must return the active session")

    // 2. SQL door.
    Graft.registerTables(s, sfDir)
    val topParts = s.sql("""
      SELECT p_brand, sum(l_extendedprice * (1 - l_discount)) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY revenue DESC LIMIT 5""")
    assert(topParts.count() === 5)
    // Native function reachable from SQL text.
    assert(s.sql("SELECT md5_long('graft') AS h").first().getLong(0) != 0L)

    // 3. Named query.
    assert(Graft.queryNames.size > 190)
    val pricing = Graft.query(s, sfDir, "rel_q1_pricing_summary")
    assert(pricing.count() > 0)
    intercept[IllegalArgumentException](Graft.query(s, sfDir, "nope"))

    // 4. Dedup over a (doc_id, text) corpus.
    val corpus = Graft.table(s, sfDir, "documents")
      .selectExpr("doc_id", "lower(text) AS text")
    val pairs = graft.llm.Dedup.minhashPairs(corpus)
    val kept = graft.llm.Dedup.keepSet(corpus, pairs)
    val nDocs = corpus.count()
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= nDocs,
      s"keep-set must be a non-empty subset: $nKept of $nDocs")

    // 5. Native as-of join.
    val enriched = graft.plans.AsofJoin.left(
      probes = Graft.table(s, sfDir, "events")
        .selectExpr("user_id", "ts", "event_type"),
      states = Graft.table(s, sfDir, "events")
        .selectExpr("user_id AS s_user", "ts AS s_ts", "value AS s_value"),
      keys = Seq("user_id" -> "s_user"),
      probeTimeCol = "ts", stateTimeCol = "s_ts")
    assert(enriched.columns.toSet ===
      Set("user_id", "ts", "event_type", "s_user", "s_ts", "s_value"))
    assert(enriched.count() === Graft.table(s, sfDir, "events").count(),
      "asof left join must keep every probe row")
  }
}
