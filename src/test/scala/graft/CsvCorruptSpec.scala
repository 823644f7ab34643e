package graft

import graft.pipeline.ActivityPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The reference's `badRecordsPath` analog (SURVEY S1): structurally broken
  * CSV rows — wrong arity, unparseable per the schema — are captured in a
  * corrupt-record column under PERMISSIVE mode instead of killing the read,
  * while intact rows parse normally. (Semantic errors are the bronze gate's
  * job; this covers the layer below it.) */
class CsvCorruptSpec extends SparkSpec {

  test("PERMISSIVE csv read captures malformed rows in _corrupt_record") {
    val dir = tempDir("csv_corrupt")
    val f = new java.io.PrintWriter(new java.io.File(dir, "raw.csv"))
    f.println("log_id,user_id,timestamp,ip_address,watch_time(min)")
    f.println("log_1,user_1,2024-03-01 10:00:00,192.168.1.5,10")   // good
    f.println("log_2,user_2,2024-03-01 10:01:00,10.0.0.9,not_a_number") // bad type
    f.println("log_3,user_3,2024-03-01 10:02:00,172.16.0.3,30")    // good
    f.close()

    val schema = StructType(
      ActivityPipeline.RawSchema.fields :+ StructField("_corrupt_record", StringType))
    val df = spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache()

    assert(df.count() === 3)
    val corrupt = df.filter(col("_corrupt_record").isNotNull)
    assert(corrupt.count() === 1)
    assert(corrupt.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    // Malformed row: the unparseable field is null, the raw line retained.
    assert(corrupt.head.getAs[Any]("watch_time(min)") == null)
    // Intact rows parse fully.
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() === 2)
    assert(good.filter(col("watch_time(min)").isNull).count() === 0)
    df.unpersist()
  }
}
