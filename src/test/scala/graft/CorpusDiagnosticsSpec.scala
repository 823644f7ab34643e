package graft

import graft.llm.CorpusDiagnostics
import org.apache.spark.sql.functions._

/** Semantic invariants for the corpus-diagnostics operators beyond the
  * DuckDB hash gate, on hand-built corpora where the expected answer is
  * known exactly. */
class CorpusDiagnosticsSpec extends SparkSpec {
  private val s = spark
  import s.implicits._

  private def toksDoc(words: Seq[String]): String = words.mkString(" ")

  test("vocab growth: monotone, types <= tokens, saturates past the corpus") {
    val rows = graft.llm.CorpusDiagnostics.queries("llm_vocab_growth")
      .fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    rows.sliding(2).foreach { case Array((_, t1, v1, _), (_, t2, v2, _)) =>
      assert(t2 >= t1 && v2 >= v1, "growth must be monotone in the prefix")
    }
    rows.foreach { case (cp, tokens, types, ttr) =>
      assert(types <= tokens && ttr <= 1.0 && ttr > 0.0, s"checkpoint $cp")
      assert(ttr === types.toDouble / tokens)
    }
    // Checkpoints past the corpus size see the whole corpus: identical.
    val n = graft.sources.Tables.load(spark, sfDir, "documents").count()
    val past = rows.filter(_._1 >= n)
    assert(past.length >= 2 && past.map(r => (r._2, r._3)).distinct.length === 1)
    // Heaps: type growth is strictly sublinear across the measured decades
    // (TTR falls as the prefix grows) on any natural-ish corpus.
    assert(rows.head._4 > rows.last._4)
  }

  test("dupSpans merges adjacent duplicated windows into one maximal span") {
    // doc 1 and doc 2 share an exact 12-token run; everything else is
    // unique filler, so with k=8 the duplicated windows in each doc are
    // positions of a single contiguous island → ONE span of length 12.
    val shared = (1 to 12).map(i => s"dup$i")
    val d1 = toksDoc((1 to 10).map(i => s"a$i") ++ shared ++ (1 to 10).map(i => s"b$i"))
    val d2 = toksDoc((1 to 7).map(i => s"c$i") ++ shared ++ (1 to 9).map(i => s"d$i"))
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val spans = CorpusDiagnostics.dupSpans(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    // 12-token run with k=8 → 5 windows per doc, one island each.
    assert(spans === Seq((1L, 11, 12, 5L), (2L, 8, 12, 5L)))
  }

  test("dupSpans: within-document repetition counts as duplication") {
    // One doc repeats its own 8-token phrase twice with unique filler
    // between → both occurrences are duplicated windows, two islands.
    val phrase = (1 to 8).map(i => s"p$i")
    val d = toksDoc(phrase ++ (1 to 10).map(i => s"x$i") ++ phrase)
    val docs = Seq((7L, d)).toDF("doc_id", "text")
    val spans = CorpusDiagnostics.dupSpans(docs, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(spans === Seq((7L, 1, 8, 1L), (7L, 19, 8, 1L)))
  }

  test("dupSpans emits nothing for an all-unique corpus") {
    val docs = Seq(
      (1L, toksDoc((1 to 30).map(i => s"u$i"))),
      (2L, toksDoc((1 to 30).map(i => s"v$i")))).toDF("doc_id", "text")
    assert(CorpusDiagnostics.dupSpans(docs, k = 8).count() === 0)
  }

  test("sourceOverlap computes exact Jaccard/containment on a known overlap") {
    // Grams are 2-token windows. src A text has grams {a b, b c, c d};
    // src B has {b c, c d, d e} → intersection 2, union 4.
    val docs = Seq(
      ("A", "a b c d"),
      ("B", "b c d e")).toDF("source", "text")
    val r = CorpusDiagnostics.sourceOverlap(docs, n = 2).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("src_a") === "A")
    assert(row.getAs[Long]("n_a") === 3 && row.getAs[Long]("n_b") === 3)
    assert(row.getAs[Long]("n_common") === 2)
    assert(row.getAs[Double]("jaccard") === 0.5)
    assert(row.getAs[Double]("containment_a") === 2.0 / 3)
  }

  test("sourceOverlap is symmetric-complete and bounded on the fixtures") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val m = CorpusDiagnostics.sourceOverlap(docs, n = 5).cache()
    // Normalized pair order: src_a < src_b always, no self-pairs.
    assert(m.filter(col("src_a") >= col("src_b")).count() === 0)
    // Jaccard and containments in (0, 1]; n_common ≤ min(n_a, n_b).
    assert(m.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() === 0)
    assert(m.filter(col("n_common") > least(col("n_a"), col("n_b"))).count() === 0)
    m.unpersist()
  }

  test("lexicalDiversity: exact rational values on a tiny doc") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text")
    val r = CorpusDiagnostics.lexicalDiversity(docs).collect().head
    assert(r.getAs[Int]("n_tokens") === 3)
    assert(r.getAs[Int]("n_types") === 2)
    assert(r.getAs[Int]("n_hapax") === 1)
    assert(r.getAs[Double]("ttr") === 2.0 / 3)
    assert(r.getAs[Double]("hapax_frac") === 0.5)
    // 1 − (2² + 1²)/3² = 4/9
    assert(r.getAs[Double]("gini_simpson") === 1.0 - 5.0 / 9)
  }

  test("lexicalDiversity bounds hold corpus-wide") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val d = CorpusDiagnostics.lexicalDiversity(docs).cache()
    assert(d.count() === docs.count())
    assert(d.filter(col("n_types") > col("n_tokens") ||
      col("n_hapax") > col("n_types") ||
      col("ttr") <= 0 || col("ttr") > 1 ||
      col("gini_simpson") < 0 || col("gini_simpson") >= 1).count() === 0)
    d.unpersist()
  }

  test("dupSpans plan: no doc-to-doc join, islands via one window per doc") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val plan = CorpusDiagnostics.dupSpans(docs, k = 8)
      .queryExecution.executedPlan.toString
    // The only join is the LEFT SEMI probe of windows against the
    // duplicated-gram set — never a pair-expanding inner join of docs.
    assert(plan.contains("LeftSemi"), s"expected left-semi probe in:\n$plan")
  }
}
