package graft

import graft.llm.SftOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the SFT conversation operators beyond the
  * DuckDB hash gate: a pure-Scala reference parser over the planted
  * construction, per-defect targeting in both directions, the dedup
  * survivor rule, token-accounting reconciliation, and the plan shapes
  * that keep each op scale-sound. */
class SftOpsSpec extends SparkSpec {

  private def run(name: String) = SftOps.queries(name).fn(spark, sfDir)

  /** Pure-Scala mirror of the planted transcript construction. */
  private def refTranscript(id: Long, text: String): String = {
    val pool = Seq(
      "summarize the document in one sentence",
      "list the key entities mentioned",
      "translate the passage to french")
    def slice(start: Int, len: Int): String = {
      val s0 = (start - 1).min(text.length)
      text.substring(s0, (s0 + len).min(text.length))
    }
    def u(i: Int): String =
      if (i == 0 && id % 11 == 0) pool((id % 3).toInt)
      else slice(1 + 7 * i, 32)
    def a(i: Int): String =
      if (id % 23 == 0 && id % 3 == i) "" else slice(4 + 11 * i, 48)
    val sb = new StringBuilder
    if (id % 4 != 0) sb.append("system: follow the corpus instructions carefully\n")
    val pairs = 1 + (id % 3).toInt
    (0 until pairs).foreach { i =>
      sb.append(s"user: ${u(i)}\n")
      if (i == 0 && id % 17 == 0) sb.append(s"user: ${u(i)}\n")
      sb.append(s"assistant: ${a(i)}\n")
    }
    if (id % 19 == 0) sb.append(s"user: ${slice(9, 24)}\n")
    sb.toString
  }

  private def refTurns(tr: String): Seq[(String, String)] =
    tr.split("\n", -1).filter(_.nonEmpty).toSeq
      .map { l => val r = l.takeWhile(_ != ':'); (r, l.drop(r.length + 2)) }

  // ------------------------------------------------------------------
  test("parse matches a pure-Scala reference on every document") {
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = run("llm_sft_parse").collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val turns = refTurns(refTranscript(id, texts(id)))
      assert(r.getInt(1) === turns.length, s"doc $id n_turns")
      assert(r.getInt(2) === turns.count(_._1 == "user"), s"doc $id n_user")
      assert(r.getInt(3) === turns.count(_._1 == "assistant"), s"doc $id n_assistant")
      assert(r.getBoolean(4) === turns.exists(_._1 == "system"), s"doc $id has_system")
      assert(r.getString(5) === turns.map(_._1.take(1)).mkString(","), s"doc $id roles")
      assert(r.getBoolean(8) === turns.exists(_._2.isEmpty), s"doc $id has_empty_turn")
    }
  }

  test("each planted defect is detected on exactly its ids; clean dialogs are valid") {
    val rows = run("llm_sft_parse").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val validAlt = r.getBoolean(6)
      val endsA = r.getBoolean(7)
      val hasEmpty = r.getBoolean(8)
      val isValid = r.getBoolean(9)
      if (id % 17 == 0) assert(!validAlt, s"doc $id duplicate-user must break alternation")
      if (id % 19 == 0) { assert(!endsA, s"doc $id trails a user turn"); assert(!validAlt) }
      if (id % 23 == 0) assert(hasEmpty, s"doc $id empty assistant turn")
      if (id % 17 != 0 && id % 19 != 0 && id % 23 != 0) {
        assert(validAlt && endsA && !hasEmpty && isValid, s"doc $id should be clean")
      }
      assert(isValid === (validAlt && !hasEmpty))
    }
  }

  // ------------------------------------------------------------------
  test("prompt dedup: one survivor per group, most assistant content wins, pool groups real") {
    val rows = run("llm_sft_prompt_dedup").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    rows.groupBy(_._2).foreach { case (prompt, g) =>
      assert(g.count(_._5) === 1, s"prompt '$prompt' must keep exactly one")
      assert(g.forall(_._3 == g.length), "group_size must equal the group's row count")
      val winner = g.filter(_._5).head
      val best = g.minBy(x => (-x._4, x._1))
      assert(winner._1 === best._1, s"survivor rule violated for '$prompt'")
    }
    // The 3 planted pool prompts form genuine multi-dialog groups.
    val pools = rows.filter(_._1 % 11 == 0).groupBy(_._2)
    assert(pools.size === 3 && pools.values.forall(_.length > 1))
  }

  // ------------------------------------------------------------------
  test("preference pairs: chosen dominates, both sides valid, consistent with dedup") {
    val pairs = run("llm_sft_pairs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pairs.nonEmpty, "the planted prompt pool must yield real pairs")
    val valid = run("llm_sft_parse").filter(col("is_valid"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    pairs.foreach { case (prompt, cid, rid, cc, rc, margin) =>
      assert(valid(cid) && valid(rid), s"pair over invalid dialog: $prompt")
      assert(margin === cc - rc)
      // The chosen side wins on content, or ties with the smaller id.
      assert(cc > rc || (cc == rc && cid < rid), s"survivor rule violated: $prompt")
    }
    // Exactly one chosen per prompt; every group member appears.
    pairs.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).distinct.length === 1)
      assert(g.map(_._3).distinct.length === g.length)
    }
  }

  // ------------------------------------------------------------------
  test("token accounting reconciles: prompt + assistant = total, report sums match") {
    val toks = run("llm_sft_tokens").collect()
    toks.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(4), "token partition")
      val ratio = r.getDouble(5)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(ratio === r.getLong(3).toDouble / r.getLong(4))
    }
    val parse = run("llm_sft_parse")
    val report = run("llm_sft_report")
    val nValid = report.agg(sum("n_valid")).collect()(0).getLong(0)
    assert(nValid === parse.filter(col("is_valid")).count())
    val nConvos = report.agg(sum("n_convos")).collect()(0).getLong(0)
    assert(nConvos === parse.count())
  }

  // ------------------------------------------------------------------
  test("plan shapes: parse/tokens single-scan no-shuffle; dedup shuffles once on the prompt") {
    Seq("llm_sft_parse", "llm_sft_tokens").foreach { q =>
      val plan = run(q).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q must not shuffle:\n$plan")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
      assert(!plan.contains("Generate"), s"$q must not explode turns:\n$plan")
    }
    val dedup = run("llm_sft_prompt_dedup").queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(dedup).length === 1,
      s"prompt dedup is ONE shuffle on the prompt key:\n$dedup")
  }
}
