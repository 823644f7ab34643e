package graft

import graft.plans.{AsofJoin, AsofJoinExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.functions._

/** Native as-of join ([[graft.plans.AsofJoinExec]]): edge-case semantics on
  * synthetic data, partition safety, and the physical contract — one
  * exchange per side, (key, time) sorts, probe-side partitioning reused
  * downstream.
  */
class AsofJoinSpec extends SparkSpec {
  private val s0 = spark
  import s0.implicits._

  private def probes = Seq(
    // (probe_id, key, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 5L),
    (5L, "b", 100L),               // key with no states at all
    (6L, "c", 50L), (7L, "c", 51L) // state exactly at t and after t
  ).toDF("probe_id", "k", "t")

  private def states = Seq(
    // (key, t, v)
    ("a", 8L, "a8"), ("a", 20L, "a20"), ("a", 30L, "a30"),
    ("c", 51L, "c51"),
    ("d", 1L, "d1") // states-only key: must not be emitted
  ).toDF("k", "st", "v")

  private val expected = Set(
    (1L, Some("a8")),   // 10 >= 8, < 20
    (2L, Some("a20")),  // inclusive at equal time
    (3L, Some("a20")),
    (4L, None),         // before first state
    (5L, None),         // key has no states
    (6L, None),         // state is strictly after probe
    (7L, Some("c51")))

  private def run(np: Int): Set[(Long, Option[String])] =
    AsofJoin.left(
        probes.repartition(np), states.repartition(np),
        Seq("k" -> "k"), "t", "st")
      .select($"probe_id", $"v")
      .as[(Long, Option[String])].collect().toSet

  test("as-of semantics: inclusive match, no-state nulls, states-only keys dropped") {
    assert(run(4) === expected)
  }

  test("result is partitioning-independent (1, 3, and 16 partitions)") {
    assert(run(1) === expected)
    assert(run(3) === expected)
    assert(run(16) === expected)
  }

  test("physical plan: AsofJoinExec with one exchange and one sort per side") {
    val df = AsofJoin.left(probes, states, Seq("k" -> "k"), "t", "st")
    df.collect()
    // Deep collect across AQE stage boundaries (QueryStageExec children
    // live behind `plan`, not `children`).
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => deep(q.plan)
      case other => other.children.flatMap(deep)
    })
    val nodes = deep(df.queryExecution.executedPlan)
    val asof = nodes.collect { case a: AsofJoinExec => a }
    assert(asof.size === 1,
      s"expected one AsofJoinExec:\n${df.queryExecution.executedPlan}")
    val exchanges = nodes.collect { case e: ShuffleExchangeLike => e }
    assert(exchanges.size === 2,
      s"expected exactly one exchange per side, got ${exchanges.size}")
    val sorts = nodes.collect { case s: SortExec => s }
    assert(sorts.size === 2, "expected one (key, time) sort per side")
    assert(sorts.forall(_.sortOrder.size === 2),
      "each sort must order by (key, time)")
  }

  test("self-join without realiasing is rejected (shared expression IDs)") {
    val base = Seq((1L, "a", 10L)).toDF("probe_id", "k", "t")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.left(base, base.filter($"t" > 0), Seq("k" -> "k"), "t", "t")
    }
    assert(e.getMessage.contains("share attributes"))
  }

  private def runDir(direction: String, tolerance: Option[Long] = None)
      : Set[(Long, Option[String])] =
    AsofJoin.left(probes, states, Seq("k" -> "k"), "t", "st",
        direction = direction, tolerance = tolerance)
      .select($"probe_id", $"v")
      .as[(Long, Option[String])].collect().toSet

  test("forward direction: smallest state time at-or-after each probe") {
    assert(runDir(AsofJoin.Forward) === Set(
      (1L, Some("a20")), // 10 → next is 20
      (2L, Some("a20")), // inclusive at equal time
      (3L, Some("a20")),
      (4L, Some("a8")),  // 5 → next is 8
      (5L, None),        // key has no states
      (6L, Some("c51")), // 50 → next is 51
      (7L, Some("c51"))))// inclusive
  }

  test("nearest direction: closer of the two candidates, tie → backward") {
    assert(runDir(AsofJoin.Nearest) === Set(
      (1L, Some("a8")),  // back diff 2 beats fwd diff 10
      (2L, Some("a20")), // exact hit
      (3L, Some("a20")),
      (4L, Some("a8")),  // no backward candidate, forward diff 3
      (5L, None),
      (6L, Some("c51")), // forward diff 1
      (7L, Some("c51"))))
    // Tie case gets its own data: probe at 25 sits exactly between states
    // 20 and 30 — the backward (earlier) match must win.
    val p = Seq((1L, "a", 25L)).toDF("probe_id", "k", "t")
    val s = Seq(("a", 20L, "a20"), ("a", 30L, "a30")).toDF("k", "st", "v")
    val tie = AsofJoin.left(p, s, Seq("k" -> "k"), "t", "st",
        direction = AsofJoin.Nearest)
      .select($"probe_id", $"v").as[(Long, Option[String])].collect().toSet
    assert(tie === Set((1L, Some("a20"))))
  }

  test("tolerance bounds the match distance in every direction") {
    // Backward: probe 1 (t=10) matches a8 at diff 2 — tol 1 nulls it, the
    // row itself still flows through (left-join contract); tol 2 keeps it.
    val tol1 = runDir(AsofJoin.Backward, tolerance = Some(1L))
    assert(tol1.contains((1L, None)))
    assert(tol1.contains((2L, Some("a20")))) // diff 0 survives any tol ≥ 0
    assert(runDir(AsofJoin.Backward, tolerance = Some(2L)).contains((1L, Some("a8"))))
    // Forward: probe 6 (t=50) → c51 at diff 1; tol 0 nulls, tol 1 keeps.
    assert(runDir(AsofJoin.Forward, tolerance = Some(0L)).contains((6L, None)))
    assert(runDir(AsofJoin.Forward, tolerance = Some(1L)).contains((6L, Some("c51"))))
    // Nearest: probe 1 candidates at diff 2 (back) and 10 (fwd); tol 1
    // excludes both, tol 5 admits only the backward one.
    assert(runDir(AsofJoin.Nearest, tolerance = Some(1L)).contains((1L, None)))
    assert(runDir(AsofJoin.Nearest, tolerance = Some(5L)).contains((1L, Some("a8"))))
    // No match within tolerance anywhere → all-null state side, all probes out.
    val none = runDir(AsofJoin.Backward, tolerance = Some(0L))
    assert(none.size === 7 && none.forall {
      case (2L, v) => v.contains("a20")
      case (3L, v) => v.contains("a20")
      case (7L, v) => v.contains("c51")
      case (_, v) => v.isEmpty
    })
  }

  test("mismatched key or time types are rejected up front") {
    val p = Seq((1, 10L)).toDF("k", "t")          // int key
    val s = Seq((1L, 5L, "x")).toDF("k", "st", "v") // long key
    val e = intercept[IllegalArgumentException] {
      AsofJoin.left(p, s, Seq("k" -> "k"), "t", "st")
    }
    assert(e.getMessage.contains("type mismatch"))
    val p2 = Seq((1L, 10)).toDF("k", "t")           // int time
    val s2 = Seq((1L, 5L, "x")).toDF("k", "st", "v") // long time
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.left(p2, s2, Seq("k" -> "k"), "t", "st")
    }
    assert(e2.getMessage.contains("time type mismatch"))
  }

  test("null keys never match; null probe time yields a null match") {
    val p = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, Option.empty[String], Option(10L)), // null probe key
      (3L, Option("a"), Option.empty[Long]))   // null probe time
      .toDF("probe_id", "k", "t")
    val s = Seq(
      (Option("a"), Option(8L), "a8"),
      (Option.empty[String], Option(5L), "null-key"), // must be invisible
      (Option("a"), Option.empty[Long], "null-time")) // must be invisible
      .toDF("k", "st", "v")
    val out = AsofJoin.left(p, s, Seq("k" -> "k"), "t", "st")
      .select($"probe_id", $"v").as[(Long, Option[String])].collect().toSet
    assert(out === Set((1L, Some("a8")), (2L, None), (3L, None)))
  }

  test("matches the window spelling on real events data") {
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val probes = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val states = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"))
    val native = AsofJoin.left(probes, states,
        Seq("user_id" -> "p_user"), "ts", "p_ts")
      .select($"event_id", $"p_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toSet
    // Window spelling (the ts_asof_last_purchase shape, restricted to
    // clicks): last purchase ts at-or-before each click, per user.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Long.MinValue, 0)
    val windowed = ev.filter($"event_type".isin("click", "purchase"))
      .withColumn("lp",
        last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true)
          .over(w))
      .filter($"event_type" === "click")
      .select($"event_id", $"lp")
      .as[(Long, Option[java.sql.Timestamp])].collect().toSet
    assert(native === windowed)
  }
}
