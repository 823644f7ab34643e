package graft

import graft.sources.Tables
import graft.streaming.Scd2Stream
import graft.streaming.Scd2Stream.OrderCdc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming-maintained SCD2 dimension must equal the batch `rel_scd2`
  * operator after the full changelog has streamed through in ordered
  * micro-batches — versions, intervals, current flags, everything. */
class Scd2StreamSpec extends SparkSpec {

  test("foreachBatch-maintained SCD2 table == batch rel_scd2 on the full log") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val tableDir = tempDir("scd2_table") + "/dim"
    val cpDir = tempDir("scd2_cp")

    val log = Tables.load(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_orderpriority")
      .orderBy($"o_orderdate", $"o_orderkey")
      .as[OrderCdc].collect()

    val mem = MemoryStream[OrderCdc]
    val q = Scd2Stream.run(mem.toDS(), tableDir, cpDir)
    try {
      log.grouped(math.max(log.length / 5, 1)).foreach { chunk =>
        mem.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("prio"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("vf"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("vt"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1),
        r.getString(2), Option(r.getString(3)).getOrElse("-")))
      .sorted

    val streamed = canon(spark.read.parquet(tableDir))
    val batch = canon(SparkEntry.queries("rel_scd2")(spark, sfDir)
      .select(col("o_custkey").as("k"), col("priority").as("prio"),
        to_timestamp(col("valid_from")).as("valid_from"),
        to_timestamp(col("valid_to")).as("valid_to")))

    assert(streamed.length == batch.length,
      s"row counts differ: streamed=${streamed.length} batch=${batch.length}")
    assert(streamed.sameElements(batch), {
      val d1 = streamed.diff(batch).take(3)
      val d2 = batch.diff(streamed).take(3)
      s"content differs; streamed-only=$d1 batch-only=$d2"
    })
  }
}
