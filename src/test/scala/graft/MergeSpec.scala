package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** Unit semantics of the general batch MERGE (ANSI MERGE INTO shape). */
class MergeSpec extends SparkSpec {
  private val ss = SparkSpec.spark
  import ss.implicits._

  private def target = Seq(
    (1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
    .toDF("k", "v", "tag")

  test("matched rows update, unmatched target rows survive, inserts land") {
    val src = Seq(
      (2L, 99.0, "B", "upsert"),   // update
      (4L, 40.0, "d", "upsert"))   // insert
      .toDF("k", "v", "tag", "op")
    val out = Merge.merge(target, src, Seq("k"),
      deleteWhen = col("op") === "delete")
      .orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq((1L, 10.0, "a"), (2L, 99.0, "B"),
      (3L, 30.0, "c"), (4L, 40.0, "d")))
  }

  test("deleteWhen removes matched rows; unmatched tombstones are no-ops") {
    val src = Seq(
      (1L, 0.0, "x", "delete"),    // delete existing
      (9L, 0.0, "x", "delete"))    // tombstone for absent key: no-op
      .toDF("k", "v", "tag", "op")
    val out = Merge.merge(target, src, Seq("k"),
      deleteWhen = col("op") === "delete")
      .orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq((2L, 20.0, "b"), (3L, 30.0, "c")))
  }

  test("updateCols subset keeps unlisted columns from the target") {
    val src = Seq((2L, 99.0, "ZZZ")).toDF("k", "v", "tag")
    val out = Merge.merge(target, src, Seq("k"), updateCols = Seq("v"))
      .orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq((1L, 10.0, "a"), (2L, 99.0, "b"), (3L, 30.0, "c")))
  }

  test("insertNotMatched=false drops source-only rows") {
    val src = Seq((2L, 99.0, "B"), (4L, 40.0, "d")).toDF("k", "v", "tag")
    val out = Merge.merge(target, src, Seq("k"), insertNotMatched = false)
      .orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(out == Seq((1L, 10.0, "a"), (2L, 99.0, "B"), (3L, 30.0, "c")))
  }

  test("merge is idempotent: re-applying the same source changes nothing") {
    val src = Seq(
      (2L, 99.0, "B", "upsert"), (3L, 0.0, "x", "delete"),
      (4L, 40.0, "d", "upsert")).toDF("k", "v", "tag", "op")
    def once(df: org.apache.spark.sql.DataFrame) =
      Merge.merge(df, src, Seq("k"), deleteWhen = col("op") === "delete")
    val a = once(target).orderBy("k").as[(Long, Double, String)].collect().toSeq
    val b = once(once(target)).orderBy("k").as[(Long, Double, String)].collect().toSeq
    assert(a == b)
  }

  test("latestWins collapses a changelog to one row per key") {
    val log = Seq(
      (1L, 1, 10.0), (1L, 3, 30.0), (1L, 2, 20.0), (2L, 1, 5.0))
      .toDF("k", "seq", "v")
    val out = Merge.latestWins(log, Seq("k"), Seq(col("seq").desc))
      .orderBy("k").as[(Long, Int, Double)].collect().toSeq
    assert(out == Seq((1L, 3, 30.0), (2L, 1, 5.0)))
  }

  test("all-null data columns still match correctly (struct null-check)") {
    val tgt = Seq((1L, Option.empty[Double]), (2L, Some(2.0)))
      .toDF("k", "v")
    val src = Seq((1L, Some(9.0)), (3L, Option.empty[Double]))
      .toDF("k", "v")
    val out = Merge.merge(tgt, src, Seq("k"))
      .orderBy("k").as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq((1L, Some(9.0)), (2L, Some(2.0)), (3L, None)))
  }
}
