package graft

import graft.pipeline.ActivityPipeline
import graft.streaming.{ActivityGenerator, Medallion}
import org.apache.spark.sql.streaming.Trigger

/** The incremental gold (per-batch merge into versioned state) must produce
  * exactly what the full recompute produces, across multiple waves of
  * input. */
class IncrementalGoldSpec extends SparkSpec {

  private def drain(dirs: Medallion.Dirs): Unit = {
    val t = Trigger.AvailableNow()
    val (bv, bq) = Medallion.startBronze(spark, dirs, t)
    bv.awaitTermination(120000); bq.awaitTermination(120000)
    Medallion.startSilver(spark, dirs, t).awaitTermination(120000)
    Medallion.startGoldIncremental(spark, dirs, t).awaitTermination(120000)
  }

  private def assertGoldMatches(dirs: Medallion.Dirs): Unit = {
    val silver = spark.read.parquet(dirs.silver)
    val expected = ActivityPipeline.gold(silver)
    val gold = spark.read.parquet(dirs.gold)
    assert(gold.except(expected).isEmpty && expected.except(gold).isEmpty,
      "incremental gold diverged from full recompute")
    assert(gold.count() > 0)
  }

  test("incremental gold == full recompute across waves") {
    val dirs = Medallion.Dirs(tempDir("medallion_inc"))
    ActivityGenerator.generate(dirs.raw, numFiles = 3, rowsPerFile = 800)
    drain(dirs)
    assertGoldMatches(dirs)

    // Second wave: new file, new users and overlapping users.
    val side = tempDir("inc_raw2")
    ActivityGenerator.generate(side, numFiles = 1, rowsPerFile = 600, seed = 99L)
    assert(new java.io.File(side, "user_activity_001.csv")
      .renameTo(new java.io.File(dirs.raw, "user_activity_201.csv")))
    drain(dirs)
    assertGoldMatches(dirs)
  }
}
