package graft

import graft.llm.WebCuration
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic invariants for the web-curation operators beyond the DuckDB
  * hash gate: a pure-Scala Luhn reference, the line-dedup ban-threshold
  * edge in both directions, the public-suffix rule, and the plan shapes
  * that keep each op scale-sound. */
class WebCurationSpec extends SparkSpec {

  private def run(name: String) =
    WebCuration.queries(name).fn(spark, sfDir)

  // ------------------------------------------------------------------
  test("line dedup: planted boilerplate removed everywhere, rare footer kept") {
    val out = run("llm_line_dedup").cache()
    val footerA = "copyright footer terms apply all rights reserved"
    val rare = "rare footer only two documents share this"
    // The >=3-docs footers never survive into any cleaned document.
    assert(out.filter(col("cleaned").contains(footerA)).count() === 0)
    // The 2-doc footer is BELOW the ban threshold and survives on exactly
    // docs 1 and 2 — the threshold edge, proven from both sides.
    val withRare = out.filter(col("cleaned").contains(rare))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(withRare.toSeq === Seq(1L, 2L))
    // Reassembly: kept-line count never exceeds line count, and a document
    // with no planted footer and a unique text line round-trips verbatim.
    assert(out.filter(col("n_kept") > col("n_lines")).count() === 0)
    val d7 = out.filter(col("doc_id") === 7).collect()(0)
    val orig = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === 7).select("text").collect()(0).getString(0)
    assert(d7.getAs[String]("cleaned") === orig)
    assert(d7.getAs[Int]("n_lines") === 1 && d7.getAs[Int]("n_kept") === 1)
    out.unpersist()
  }

  test("line dedup: document count preserved (rewrite, not filter)") {
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(run("llm_line_dedup").count() === n)
  }

  // ------------------------------------------------------------------
  test("pii audit: Luhn verdicts match a pure-Scala reference implementation") {
    def luhnRef(card: String): Boolean = {
      val sum = card.zipWithIndex.map { case (ch, i0) =>
        val d = ch - '0'
        // 1-based position; length 16 => double every odd position from
        // the left (= every second digit from the right).
        if ((i0 + 1) % 2 == 1) { val v = d * 2; if (v > 9) v - 9 else v }
        else d
      }.sum
      sum % 10 == 0
    }
    val detail = WebCuration.piiDetail(Tables.load(spark, sfDir, "documents"))
      .select("doc_id", "n_cards", "cardx", "card_valid").collect()
    detail.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) {
        assert(r.getInt(1) === 1, s"doc $id should carry exactly one card")
        val expected = luhnRef(r.getString(2))
        assert((r.getInt(3) == 1) === expected, s"doc $id Luhn mismatch")
        // Planting contract: even ids get the true check digit, odd ids +3.
        assert(expected === (id % 2 == 0), s"doc $id planted validity wrong")
      } else assert(r.getInt(1) === 0, s"doc $id should carry no card")
    }
  }

  test("pii audit: per-source counts reconcile with the planting density") {
    val out = run("llm_pii_audit")
    val tot = out.agg(sum("n_docs"), sum("n_cards"), sum("n_cards_valid"),
      sum("n_phones")).collect()(0)
    val n = tot.getLong(0)
    // Dense doc_id 0..n-1: cards on every 3rd doc, valid on every 6th,
    // phones on every 7th.
    assert(tot.getLong(1) === (0L until n).count(_ % 3 == 0))
    assert(tot.getLong(2) === (0L until n).count(_ % 6 == 0))
    assert(tot.getLong(3) === (0L until n).count(_ % 7 == 0))
  }

  // ------------------------------------------------------------------
  test("domain filter: blocklist enforced, public-suffix rule applied, shares sum to 1") {
    val out = run("llm_domain_filter").cache()
    val domains = out.select("domain").collect().map(_.getString(0)).toSet
    assert(!domains.contains("tracker.biz") && !domains.contains("spamfarm.net"))
    // news.example.co.uk / shop.example.co.uk collapse to the registrable
    // example.co.uk (3 labels), not the public suffix co.uk (2 labels).
    assert(domains.contains("example.co.uk") && !domains.contains("co.uk"))
    assert(domains === Set("corpus.com", "openweb.org", "tools.io", "example.co.uk"))
    val share = out.agg(sum("doc_share")).collect()(0).getDouble(0)
    assert(math.abs(share - 1.0) < 1e-9)
    // Blocked hosts held 4 of 16 slots: kept docs = 12/16 of the corpus.
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0)
      === (0L until nDocs).count(i => !Set(5L, 6L, 7L, 8L).contains(i % 16)))
    out.unpersist()
  }

  test("domain filter: normalization strips case, query, fragment, trailing slash") {
    val s = spark
    import s.implicits._
    val raw = Seq(
      "HTTPS://WWW.CORPUS.COM/P/9?utm=x#frag",
      "https://news.example.co.uk/p/1/",
      "https://docs.tools.io/p/4").toDF("raw_url")
    val r = WebCuration.registrableDomains(raw)
      .select("norm", "host", "domain").collect()
    assert(r(0).getString(0) === "https://www.corpus.com/p/9")
    assert(r(0).getString(1) === "www.corpus.com" && r(0).getString(2) === "corpus.com")
    assert(r(1).getString(0) === "https://news.example.co.uk/p/1")
    assert(r(1).getString(2) === "example.co.uk")
    assert(r(2).getString(2) === "tools.io")
  }

  test("domain filter: blocklist join is a broadcast, not a shuffle") {
    val plan = run("llm_domain_filter").queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"expected broadcast anti-join in:\n$plan")
  }

  // ------------------------------------------------------------------
  test("gopher gate: planted degeneracies fail the right rules, clean docs pass") {
    val out = run("llm_gopher_gate").cache()
    // Truncated docs (every 13th) have exactly 5 words -> fail the floor —
    // unless the symbol plant ALSO fires (doc_id % 78 == 0), which appends
    // 8 tokens and lifts them back over it (5 + 8 = 13 words).
    assert(out.filter(pmod(col("doc_id"), lit(13)) === 0 &&
      pmod(col("doc_id"), lit(6)) =!= 0 && col("f_words")).count() === 0)
    assert(out.filter(pmod(col("doc_id"), lit(78)) === 0 && !col("f_words")).count() === 0)
    // Non-planted docs have zero symbol tokens and all-alpha tokens.
    val clean = out.filter(
      pmod(col("doc_id"), lit(6)) =!= 0 && pmod(col("doc_id"), lit(13)) =!= 0)
    assert(clean.filter(col("symbol_frac") =!= 0.0).count() === 0)
    assert(clean.filter(col("alpha_frac") =!= 1.0).count() === 0)
    // Every symbol-rule failure is a planted doc, and at least one planted
    // doc is short enough for 8 symbol tokens to trip the 10% ratio.
    val symFail = out.filter(!col("f_symbol"))
    assert(symFail.filter(pmod(col("doc_id"), lit(6)) =!= 0).count() === 0)
    assert(symFail.count() > 0)
    // keep is exactly the conjunction of the five flags.
    assert(out.filter(col("keep") =!= (col("f_words") && col("f_mwl") &&
      col("f_symbol") && col("f_alpha") && col("f_stop"))).count() === 0)
    out.unpersist()
  }

  // ------------------------------------------------------------------
  test("url dedup: variants collapse onto the canonical URL, most-content survivor kept") {
    val out = run("llm_dedup_url").cache()
    val n = Tables.load(spark, sfDir, "documents").count()
    // Dense ids -> every even/odd pair shares a page: half the corpus
    // survives and every page saw exactly 2 variants.
    assert(out.count() === (n + 1) / 2)
    assert(out.filter(col("n_variants") =!= 2).count() === 0)
    // Canonical URLs are normalized: lowercase, no query/fragment/slash.
    assert(out.filter(col("url").rlike("[?#A-Z]|/$")).count() === 0)
    // The survivor is the pair's max-n_chars member (ties -> smaller id):
    // recompute independently from the raw table.
    val best = Tables.load(spark, sfDir, "documents")
      .withColumn("page", col("doc_id") - pmod(col("doc_id"), lit(2)))
      .groupBy("page")
      .agg(max_by(col("doc_id"), struct(col("n_chars"), -col("doc_id"))).as("want"))
    val joined = out.withColumn("page",
      regexp_extract(col("url"), "/p/(\\d+)$", 1).cast("long"))
      .join(best, "page")
    assert(joined.filter(col("kept_doc") =!= col("want")).count() === 0)
    out.unpersist()
  }

  // ------------------------------------------------------------------
  test("html extract: recovers readable text, strips script/style, decodes entities last") {
    val out = run("llm_html_extract").cache()
    val orig = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = out.collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val extracted = r.getString(2)
      if (id % 2 == 0) {
        assert(r.getBoolean(1), s"doc $id should be flagged html")
        // Title + h1 text survive, script/style bodies don't, the
        // entity-encoded nav text decodes AFTER tag stripping so the
        // literal '<nav>' is text, not a stripped tag.
        assert(extracted === s"Doc $id Doc $id ${orig(id)} & <nav> links © here",
          s"doc $id extraction mismatch")
        assert(!extracted.contains("var x=1") && !extracted.contains("color:red")
          && !extracted.contains("tracking pixel"))
      } else {
        assert(!r.getBoolean(1))
        assert(extracted === orig(id), s"doc $id passthrough mismatch")
      }
    }
    out.unpersist()
  }

  test("html extract: nested encodings decode one level, not two ('&' is last)") {
    // '&amp;lt;' is the ONE-level encoding of the literal text '&lt;'. A
    // decode chain that rewrites '&amp;' first turns it into '&lt;' and
    // then the '&lt;' pass double-decodes it to '<' — extraction fidelity
    // on real HTML requires the literal '&lt;' to survive.
    val s = spark
    import s.implicits._
    val got = Seq("a &amp;lt; b &amp; c &lt; d")
      .toDF("aug")
      .selectExpr(s"${WebCuration.htmlExtractSql("aug", "")} AS x")
      .collect()(0).getString(0)
    assert(got === "a &lt; b & c < d")
  }

  test("license filter: counts match planting density, only proprietary dropped") {
    val out = run("llm_license_filter").cache()
    val n = Tables.load(spark, sfDir, "documents").count()
    val byLic = out.groupBy("license")
      .agg(sum("n_docs").as("d"), sum("n_kept").as("k"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def planted(m: Long) = (0L until n).count(_ % 5 == m).toLong
    assert(byLic("mit") === ((planted(1), planted(1))))
    assert(byLic("cc-by") === ((planted(2), planted(2))))
    assert(byLic("proprietary") === ((planted(3), 0L)))
    assert(byLic("unknown")._1 === n - planted(1) - planted(2) - planted(3))
    out.unpersist()
  }

  // ------------------------------------------------------------------
  test("web e2e: funnel partitions the corpus exactly; footers removed before gating") {
    val out = run("llm_web_e2e").cache()
    // gate_fail + license_drop + kept is a PARTITION of every source's docs.
    assert(out.filter(
      col("n_gate_fail") + col("n_license_drop") + col("n_kept") =!= col("n_docs"))
      .count() === 0)
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(out.agg(sum("n_docs")).collect()(0).getLong(0) === n)
    // Both ends of the funnel are exercised on the fixture.
    val tot = out.agg(sum("n_gate_fail"), sum("n_license_drop"), sum("n_kept")).collect()(0)
    assert(tot.getLong(0) > 0 && tot.getLong(1) > 0 && tot.getLong(2) > 0)
    // kept_tokens only counts kept docs: zero wherever nothing was kept.
    assert(out.filter(col("n_kept") === 0 && col("kept_tokens") =!= 0).count() === 0)
    out.unpersist()
  }

  test("gopher gate: single-scan plan, no shuffle, no UDFs") {
    val plan = run("llm_gopher_gate").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-row gate must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }
}
