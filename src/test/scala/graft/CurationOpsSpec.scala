package graft

import graft.llm.CurationOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Selection/export curation operators: PPS sampling invariants, fuzzy
  * decontamination correctness against a naive recompute, shuffle-export
  * permutation properties, and partitioning-independence throughout. */
class CurationOpsSpec extends SparkSpec {

  private def docs = Tables.load(spark, sfDir, "documents")

  test("epoch plan: shares sum to 1, budget conserved, repeat factors consistent") {
    val plan = graft.llm.CurationOps.queries("llm_epoch_plan")
      .fn(spark, sfDir).collect()
    val shares = plan.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"shares sum $shares")
    val avail = plan.map(_.getAs[Long]("avail_tokens")).sum
    val target = plan.map(_.getAs[Long]("target_tokens")).sum
    // Σ floor(B·share) is within |sources| of B = 4×total.
    assert(target <= 4L * avail && target > 4L * avail - plan.length)
    plan.foreach { r =>
      val epochs = r.getAs[Double]("epochs")
      val rf = r.getAs[Int]("repeat_factor")
      assert(rf === math.ceil(epochs).toInt && rf >= 1,
        s"source ${r.getString(0)}: repeat $rf vs epochs $epochs")
      // The √-flattening tilts budget TOWARD small sources: every source's
      // epoch count stays within a sane band around the 4x over-train.
      assert(epochs > 0.0)
    }
  }

  test("weighted sample: deterministic, HT weights consistent, size near budget") {
    val s1 = CurationOps.weightedSample(docs, b = 100, salt = "wps").collect()
    val s2 = CurationOps
      .weightedSample(docs.repartition(7), b = 100, salt = "wps").collect()
    // Membership is a pure function of the row — identical under any
    // partitioning.
    assert(s1.map(_.getLong(0)).sorted.sameElements(s2.map(_.getLong(0)).sorted))
    val n = docs.count()
    // Expected size is the budget; a 3x band is far beyond any plausible
    // deviation for a Poisson(100) draw.
    assert(s1.length > 30 && s1.length < 300, s"sample size ${s1.length}")
    // HT weight = max(1, SumW / (B*w)) — recompute driver-side.
    val totw = docs.agg(sum("n_chars")).head.getLong(0)
    s1.foreach { r =>
      val w = r.getLong(3); val ht = r.getDouble(4)
      assert(ht == math.max(1.0, totw.toDouble / (100.0 * w)))
    }
    // Larger docs must be sampled at a higher rate than tiny ones on
    // average: every included doc either has p=1 or won an u < p draw
    // with p proportional to w. Sanity: mean sampled weight exceeds the
    // corpus mean weight (size-biased sampling).
    val meanSampled = s1.map(_.getLong(3)).sum.toDouble / s1.length
    val meanAll = totw.toDouble / n
    assert(meanSampled > meanAll,
      s"size bias missing: $meanSampled <= $meanAll")
  }

  test("different salt draws a different sample") {
    val a = CurationOps.weightedSample(docs, 100, "wps").collect()
      .map(_.getLong(0)).toSet
    val b = CurationOps.weightedSample(docs, 100, "other").collect()
      .map(_.getLong(0)).toSet
    assert(a != b)
    // but overlap is plausible (both ~20% of a 500-doc corpus)
    assert((a & b).nonEmpty)
  }

  test("script profile: counts partition text exactly") {
    val rows = CurationOps.scriptProfile(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (n, alpha, vowel, space, other) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(alpha + space + other == n)
      assert(vowel <= alpha)
      assert(r.getBoolean(6)) // fixture is pure ASCII
    }
  }

  test("fuzzy decontamination equals the naive cross-slice jaccard join") {
    val got = CurationOps.decontaminateFuzzy(docs, "src0", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Naive recompute: exact shingle-set jaccard between the slices.
    val s = spark; import s.implicits._
    val sh = docs
      .select($"doc_id", $"source", lower($"text").as("text"))
      .withColumn("toks", split($"text", "\\s+"))
      .select($"doc_id", $"source", explode(expr(
        """array_distinct(transform(sequence(1, greatest(size(toks) - 2, 1)),
             i -> concat_ws(' ', slice(toks, i, 3))))""")).as("sh"))
    val want = sh.filter($"source" =!= "src0").as("t")
      .join(sh.filter($"source" === "src0").as("e"), $"t.sh" === $"e.sh")
      .groupBy($"t.doc_id".as("td"), $"e.doc_id".as("ed"))
      .agg(count(lit(1)).as("i"))
      .join(sh.groupBy($"doc_id".as("td")).agg(count(lit(1)).as("nt")), "td")
      .join(sh.groupBy($"doc_id".as("ed")).agg(count(lit(1)).as("ne")), "ed")
      .withColumn("j", $"i".cast("double") / ($"nt" + $"ne" - $"i"))
      .filter($"j" >= 0.5)
      .select($"td", $"ed", $"j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // No same-slice or reversed-role pairs can appear.
    val srcOf = docs.select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (t, e, _) =>
      assert(srcOf(t) != "src0" && srcOf(e) == "src0")
    }
  }

  test("shuffle export: a permutation into dense per-shard positions") {
    val rows = CurationOps.shuffleExport(docs, nShards = 16, salt = "ep0")
      .collect()
    assert(rows.length == docs.count())
    // Every doc appears exactly once.
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // Positions within each shard are exactly 1..size(shard).
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.sameElements(1 to rs.length))
    }
    // Shard sizes concentrate around N/16 (hash uniformity).
    val sizes = rows.groupBy(_.getInt(1)).map(_._2.length)
    assert(sizes.size == 16)
    val exp = rows.length / 16.0
    sizes.foreach(sz => assert(sz > exp * 0.4 && sz < exp * 1.8,
      s"skewed shard: $sz vs expected $exp"))
    // Deterministic under repartitioning.
    val again = CurationOps
      .shuffleExport(docs.repartition(5), nShards = 16, salt = "ep0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
    // A different epoch salt yields a different permutation.
    val ep1 = CurationOps.shuffleExport(docs, 16, "ep1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(ep1 != rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("curriculum: phases partition by length, per-(phase,shard) positions dense, re-salt stays in phase") {
    val out = CurationOps.curriculumExport(docs, nShards = 8, salt = "cur0")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.length === docs.count())
    // Phase is the fixed token bucket — monotone in n_tokens.
    rows.foreach { case (id, tok, phase, _, _) =>
      val want = if (tok < 16) 0 else if (tok < 32) 1 else if (tok < 64) 2 else 3
      assert(phase === want, s"doc $id tokens=$tok")
    }
    assert(rows.map(_._3).distinct.length > 1, "fixture must span multiple phases")
    // Positions are dense 1..k within every (phase, shard) — a trainer can
    // round-robin shards of a phase with no gaps.
    rows.groupBy(r => (r._3, r._4)).foreach { case (_, g) =>
      assert(g.map(_._5).sorted.sameElements(1 to g.length))
    }
    // Re-salting reorders within phases but never moves a doc across one.
    val resalt = CurationOps.curriculumExport(docs, 8, "cur1").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4)))
    val phase0 = rows.map(r => r._1 -> r._3).toMap
    resalt.foreach { case (id, phase, _, _) => assert(phase === phase0(id)) }
    assert(resalt.map(r => (r._1, r._3, r._4)).toSet !=
      rows.map(r => (r._1, r._4, r._5)).toSet)
    // One shuffle: the window's (phase, shard) exchange — no global sort.
    // (The adaptive plan string echoes the initial plan too; count only the
    // executed final section.)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange".r.findAllIn(plan).length === 1, s"one shuffle expected:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"no global sort in a curriculum export:\n$plan")
  }
}
