package graft

import graft.pipeline.ActivityPipeline
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants of the pipeline semantics (SURVEY §5 item 3),
  * over adversarial generated inputs (nulls everywhere, bad timestamps,
  * negative watch times, duplicate keys):
  *   - the quality gate is a partition: valid + quarantine = input, always;
  *   - dedup is idempotent, keeps exactly one row per key, and is a subset
  *     of its input;
  *   - enrichment is total (every row has a region; unknown IPs → Unknown);
  *   - gold conserves watch time: sum(total_watch_time) = sum over the
  *     enriched input.
  */
class PipelinePropertySpec extends SparkSpec {

  private val rawRow: Gen[Row] = for {
    logId <- Gen.frequency(
      1 -> Gen.const(null: String),
      9 -> Gen.choose(0, 30).map(i => s"log_$i"))
    userId <- Gen.frequency(
      1 -> Gen.const(null: String),
      9 -> Gen.choose(0, 10).map(i => s"user_$i"))
    ts <- Gen.frequency(
      1 -> Gen.const(null: String),
      1 -> Gen.const("not-a-timestamp"),
      8 -> Gen.choose(0, 27).map(d => f"2024-01-${d + 1}%02d 12:00:00"))
    ip <- Gen.oneOf("192.168.1.5", "10.0.0.9", "172.16.0.3", "8.8.8.8", null: String)
    wt <- Gen.frequency(
      1 -> Gen.const(null: java.lang.Long),
      1 -> Gen.choose(-50L, -1L).map(Long.box),
      8 -> Gen.choose(1L, 200L).map(Long.box))
  } yield Row(logId, userId, ts, ip, wt)

  private val rawBatch: Gen[List[Row]] = Gen.listOfN(40, rawRow)

  private def df(rows: List[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), ActivityPipeline.RawSchema)

  private def check(name: String, p: Prop): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("quality gate partitions the input") {
    check("totality", Prop.forAll(rawBatch) { rows =>
      val parsed = ActivityPipeline.parseRaw(df(rows))
      val v = ActivityPipeline.bronzeValid(parsed).count()
      val q = ActivityPipeline.bronzeQuarantine(parsed, withClock = false).count()
      v + q == rows.size
    })
  }

  test("dedup is idempotent, one row per key, subset of input") {
    check("dedup", Prop.forAll(rawBatch) { rows =>
      val bronze = ActivityPipeline.bronzeValid(ActivityPipeline.parseRaw(df(rows)))
      val once = ActivityPipeline.dedup(bronze).cache()
      val twice = ActivityPipeline.dedup(once)
      val keys = once.select("log_id").distinct().count()
      val ok = once.count() == keys &&
        twice.except(once).isEmpty && once.except(twice).isEmpty &&
        once.except(bronze).isEmpty
      once.unpersist()
      ok
    })
  }

  test("enrichment is total and maps fixed entries verbatim") {
    check("enrich", Prop.forAll(rawBatch) { rows =>
      val enr = ActivityPipeline.enrich(ActivityPipeline.dedup(
        ActivityPipeline.bronzeValid(ActivityPipeline.parseRaw(df(rows))))).cache()
      val ok = enr.filter(col("geo_region").isNull).count() == 0 &&
        enr.filter(col("ip_address") === "192.168.1.5" &&
          col("geo_region") =!= "South America").count() == 0 &&
        enr.filter(col("ip_address") === "8.8.8.8" &&
          col("geo_region") =!= "Unknown").count() == 0
      enr.unpersist()
      ok
    })
  }

  test("gold conserves total watch time") {
    check("gold", Prop.forAll(rawBatch) { rows =>
      val enr = ActivityPipeline.enrich(ActivityPipeline.dedup(
        ActivityPipeline.bronzeValid(ActivityPipeline.parseRaw(df(rows))))).cache()
      val gold = ActivityPipeline.gold(enr)
      val inSum = enr.agg(sum(col("watch_time").cast("decimal(30,6)"))).head.getDecimal(0)
      val outSum = gold.agg(sum(col("total_watch_time").cast("decimal(30,6)"))).head.getDecimal(0)
      val oneRowPerUser = gold.count() == enr.select("user_id").distinct().count()
      enr.unpersist()
      (inSum == null && outSum == null ||
        inSum != null && outSum != null && inSum.compareTo(outSum) == 0) && oneRowPerUser
    })
  }
}
