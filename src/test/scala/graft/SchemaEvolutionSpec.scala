package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema evolution on layer tables: when a new column starts arriving,
  * files written before the change lack it. The engine's rule — declared
  * schemas are authoritative — must make old files read as null-padded
  * rows (never a failure, never silent column drift), identically on the
  * batch and streaming read paths. */
class SchemaEvolutionSpec extends SparkSpec {

  private val v2Schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType),
    StructField("region", StringType))) // added in "v2"

  test("declared-schema reads null-pad pre-evolution files, batch and streaming") {
    val s = spark
    import s.implicits._
    val dir = tempDir("evolve")
    // v1 writer: two columns.
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    // v2 writer: the region column exists.
    Seq((3L, "c", "EU")).toDF("id", "v", "region")
      .write.mode("append").parquet(dir)

    // Batch path: the DECLARED (v2) schema is authoritative.
    val batch = spark.read.schema(v2Schema).parquet(dir)
    val rows = batch.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSeq === Seq(
      (1L, "a", None), (2L, "b", None), (3L, "c", Some("EU"))),
      "old files must null-pad the evolved column")

    // Aggregations see the evolved column as nullable, not as zero/garbage.
    val n = batch.filter(col("region").isNull).count()
    assert(n === 2L)

    // Streaming path (the layer-tail read): same declared schema, same
    // null-padding, regardless of file vintage.
    val outDir = tempDir("evolve_out")
    val q = spark.readStream.schema(v2Schema).parquet(dir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", tempDir("evolve_cp"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    assert(q.awaitTermination(120000), "availableNow drain timed out")
    val streamed = spark.read.schema(v2Schema).parquet(outDir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(streamed.toSeq === rows.toSeq,
      "streaming read diverged from the batch read on evolved files")
  }
}
