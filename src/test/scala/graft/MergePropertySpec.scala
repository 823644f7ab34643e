package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants of the batch MERGE over adversarial generated
  * change sets (overlapping keys, tombstones for absent keys, null values):
  *   - key partition: out-keys = (target-keys \ deleted) ∪ inserted;
  *   - no duplicate keys in the output when the source is key-unique;
  *   - untouched rows survive byte-identically;
  *   - idempotence: applying the same source twice equals applying it once.
  */
class MergePropertySpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private case class Chg(k: Long, v: Option[Double], op: String)

  private val targetRows: Gen[List[(Long, Option[Double])]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0L, 19L)
      v <- Gen.frequency(1 -> Gen.const(None: Option[Double]),
        4 -> Gen.choose(0.0, 100.0).map(Some(_)))
    } yield (k, v)).map(_.distinctBy(_._1))

  private val sourceRows: Gen[List[Chg]] =
    Gen.listOfN(20, for {
      k <- Gen.choose(0L, 29L) // overlaps target keys 0-19, inserts 20-29
      v <- Gen.frequency(1 -> Gen.const(None: Option[Double]),
        4 -> Gen.choose(0.0, 100.0).map(Some(_)))
      op <- Gen.frequency(3 -> Gen.const("upsert"), 1 -> Gen.const("delete"))
    } yield Chg(k, v, op)).map(_.distinctBy(_.k))

  private def merged(t: List[(Long, Option[Double])], s: List[Chg]) =
    Merge.merge(
      t.toDF("k", "v"),
      s.map(c => (c.k, c.v, c.op)).toDF("k", "v", "op"),
      keys = Seq("k"), deleteWhen = col("op") === "delete")
      .select("k", "v").as[(Long, Option[Double])].collect().toList.sortBy(_._1)

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("merge partitions keys: (target \\ deleted) ∪ inserted, no dup keys") {
    check("keys", Prop.forAll(targetRows, sourceRows) { (t, s) =>
      val out = merged(t, s)
      val tKeys = t.map(_._1).toSet
      val deleted = s.filter(_.op == "delete").map(_.k).toSet
      val inserted = s.filter(c => c.op == "upsert" && !tKeys(c.k)).map(_.k).toSet
      val expected = (tKeys -- deleted) ++ inserted
      out.map(_._1).toSet == expected && out.map(_._1).distinct == out.map(_._1)
    })
  }

  test("matched rows take source values; untouched rows survive unchanged") {
    check("values", Prop.forAll(targetRows, sourceRows) { (t, s) =>
      val out = merged(t, s).toMap
      val srcByKey = s.map(c => c.k -> c).toMap
      t.forall { case (k, v) =>
        srcByKey.get(k) match {
          case None => out.get(k).contains(v)                       // untouched
          case Some(c) if c.op == "delete" => !out.contains(k)      // deleted
          case Some(c) => out.get(k).contains(c.v)                  // updated
        }
      }
    })
  }

  test("merge is idempotent under re-application of the same source") {
    check("idempotent", Prop.forAll(targetRows, sourceRows) { (t, s) =>
      val once = merged(t, s)
      val twice = {
        val t2 = once
        merged(t2, s)
      }
      // Re-applying: deletes are no-ops (keys gone), upserts rewrite the
      // same values, inserts match themselves — a fixpoint.
      once == twice
    })
  }
}
