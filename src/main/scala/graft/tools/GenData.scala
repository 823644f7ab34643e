package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-fixture generator: the driver's sf0.001–0.1 parquet tables
  * (TESTDATA.md) re-created at arbitrary scale factors so the engine can be
  * measured at sf1/sf10 — 10–100× the committed fixtures — without touching
  * the read-only `/root/testdata`.
  *
  * Everything is DERIVED, nothing is sampled: every column is a pure
  * function of the row id via xxhash64, so generation is embarrassingly
  * parallel (a `spark.range` per table, no shuffles except the lineitem
  * fan-out's implicit generate), reproducible bit-for-bit at any
  * parallelism, and needs no driver-side state — the same recipe would
  * generate a 100 TB fixture on a real cluster. Distributions mirror the
  * committed fixtures (measured at sf0.1): same schemas, key ranges scaled
  * linearly, same categorical values and shares, same date ranges, the same
  * ~1.6e-3 exact-duplicate rate in `documents` (the positives the dedup
  * family detects), and `events.ts` stored as a nanos LONG to match how
  * `Tables.load` normalizes the driver fixture's TIMESTAMP(NANOS).
  *
  * Usage: `runMain graft.tools.GenData <outDir> <sf>`.
  */
object GenData {
  /** Deterministic uniform in [0, 1) from hashed columns. */
  private def u(cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(1000000L)).cast("double") / 1000000.0

  /** Deterministic non-negative long from hashed columns, mod n. */
  private def h(n: Long, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(n))

  private def pick(values: Seq[String], cols: Column*): Column =
    element_at(array(values.map(lit): _*),
      (h(values.size.toLong, cols: _*) + 1).cast("int"))

  // The documents vocabulary observed in the committed fixtures.
  private val vocab = Seq(
    "a", "agg", "batch", "big", "blue", "column", "customer", "data",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val sf = args(1).toDouble
    val spark = GraftSession("graft-gendata")
    try generate(spark, outDir, sf)
    finally spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, sf: Double): Unit = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    def range(n: Long): DataFrame =
      spark.range(0L, n, 1L, parts).toDF("id")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[gendata] wrote $name")
    }

    val nCust = (150000 * sf).toLong
    val nSupp = (10000 * sf).toLong
    val nPart = (200000 * sf).toLong
    val nOrd = (1500000 * sf).toLong
    val nEvents = (1000000 * sf).toLong
    val nDocs = (50000 * sf).toLong
    val nVecs = (20000 * sf).toLong

    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")

    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation")

    write(range(nCust).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      h(25, $"id", lit(1)).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u($"id", lit(2)) * 11000.0, 2).as("c_acctbal"),
      pick(Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY"), $"id", lit(3)).as("c_mktsegment")), "customer")

    write(range(nSupp).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      h(25, $"id", lit(4)).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u($"id", lit(5)) * 11000.0, 2).as("s_acctbal")),
      "supplier")

    write(range(nPart).select(
      $"id".as("p_partkey"),
      concat_ws(" ",
        pick(Seq("large", "hot", "blue", "small", "dark", "light"),
          $"id", lit(6)),
        pick(Seq("ring", "bolt", "washer", "gear", "cog", "pin"),
          $"id", lit(7))).as("p_name"),
      concat(lit("Brand#"), (h(25, $"id", lit(8)) + 1).cast("string"))
        .as("p_brand"),
      pick(Seq("ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"),
        $"id", lit(9)).as("p_type"),
      (h(50, $"id", lit(10)) + 1).cast("int").as("p_size"),
      (lit(900.0) + h(1000, $"id", lit(11)).cast("double") / 10.0)
        .as("p_retailprice")), "part")

    // o_orderdate: day-granular timestamps over 1995-01-01..2001-08-01
    // (2404 days), matching the fixture's range.
    val epoch95 = 788918400L // 1995-01-01 UTC
    val orders = range(nOrd).select(
      $"id".as("o_orderkey"),
      h(math.max(nCust, 1L), $"id", lit(12)).as("o_custkey"),
      pick(Seq("F", "O", "P"), $"id", lit(13)).as("o_orderstatus"),
      round(lit(1000.0) + u($"id", lit(14)) * 499000.0, 2)
        .as("o_totalprice"),
      timestamp_seconds(lit(epoch95) + h(2404, $"id", lit(15)) * 86400L)
        .as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        $"id", lit(16)).as("o_orderpriority"))
    write(orders, "orders")

    // lineitem fans out of orders map-side: 1..7 lines per order (mean 4,
    // ≈ the fixture's lineitem/orders ratio), every column a hash of
    // (orderkey, linenumber). No shuffle — the generate rides the scan.
    write(orders.select($"o_orderkey", $"o_orderdate",
        explode(sequence(lit(1),
          (h(7, $"o_orderkey", lit(17)) + 1).cast("int")))
          .as("l_linenumber"))
      .select(
        $"o_orderkey".as("l_orderkey"),
        h(math.max(nPart, 1L), $"o_orderkey", $"l_linenumber", lit(18))
          .as("l_partkey"),
        h(math.max(nSupp, 1L), $"o_orderkey", $"l_linenumber", lit(19))
          .as("l_suppkey"),
        $"l_linenumber",
        (h(50, $"o_orderkey", $"l_linenumber", lit(20)) + 1)
          .cast("double").as("l_quantity"),
        round(lit(900.0) +
          u($"o_orderkey", $"l_linenumber", lit(21)) * 104100.0, 2)
          .as("l_extendedprice"),
        (h(11, $"o_orderkey", $"l_linenumber", lit(22)).cast("double") / 100.0)
          .as("l_discount"),
        (h(9, $"o_orderkey", $"l_linenumber", lit(23)).cast("double") / 100.0)
          .as("l_tax"),
        pick(Seq("A", "N", "R"), $"o_orderkey", $"l_linenumber", lit(24))
          .as("l_returnflag"),
        pick(Seq("F", "O"), $"o_orderkey", $"l_linenumber", lit(25))
          .as("l_linestatus"),
        timestamp_seconds(unix_timestamp($"o_orderdate") +
          (h(95, $"o_orderkey", $"l_linenumber", lit(26)) + 1) * 86400L)
          .as("l_shipdate")), "lineitem")

    // events.ts: timestamp[us] without timezone (TIMESTAMP_NTZ) over 30 days
    // of 2024-01 — mirrors the driver fixture's current encoding; the
    // schema-adaptive Tables.load reinterprets the wall clock as UTC.
    // (Earlier fixture generations carried TIMESTAMP(NANOS)/nanos-long;
    // Tables.load still accepts those — TablesLoadSpec covers both.)
    val epoch24us = 1704067200L * 1000000L // 2024-01-01 UTC, micros
    write(range(nEvents).select(
      $"id".as("event_id"),
      timestamp_micros(lit(epoch24us) + h(30L * 86400L * 1000000L, $"id", lit(27)))
        .cast("timestamp_ntz").as("ts"),
      h(math.max(nCust / 10, 1L), $"id", lit(28)).as("user_id"),
      pick(Seq("click", "error", "purchase", "signup", "view"),
        $"id", lit(29)).as("event_type"),
      round(u($"id", lit(30)) * 560.0, 2).as("value"),
      concat(lit("{\"k\": "), h(100, $"id", lit(31)).cast("string"),
        lit("}")).as("props")), "events")

    // documents: 10..100 words from the fixture vocabulary; one doc per 625
    // reuses the text of the block head — the same ~1.6e-3 exact-duplicate
    // rate the committed fixtures carry (the dedup family's positives).
    val vocabCol = array(vocab.map(lit): _*)
    write(range(nDocs)
      .withColumn("text_seed",
        when($"id" % 625 === 624, $"id" - 624).otherwise($"id"))
      .withColumn("n_words", (h(91, $"text_seed", lit(32)) + 10).cast("int"))
      .select(
        $"id".as("doc_id"),
        array_join(transform(sequence(lit(0), $"n_words" - 1),
          i => element_at(vocabCol,
            (pmod(xxhash64($"text_seed", i, lit(33)),
              lit(vocab.size.toLong)) + 1).cast("int"))), " ").as("text"),
        element_at(array(lit("en"), lit("de"), lit("es"), lit("fr"),
          lit("zh")),
          when(h(100, $"id", lit(34)) < 41, 1)
            .when(h(100, $"id", lit(34)) < 56, 2)
            .when(h(100, $"id", lit(34)) < 71, 3)
            .when(h(100, $"id", lit(34)) < 86, 4)
            .otherwise(5)).as("lang"),
        concat(lit("src"), h(20, $"id", lit(35)).cast("string"))
          .as("source"))
      .withColumn("n_chars", length($"text").cast("long")), "documents")

    // embeddings: 64-dim ~unit-norm float vectors (components ±0.39, the
    // fixture's observed envelope), labels uniform over 10.
    write(range(nVecs).select(
      $"id".as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => ((pmod(xxhash64($"id", j, lit(36)), lit(1000000L))
          .cast("double") / 1000000.0) * 0.78 - 0.39).cast("float"))
        .as("embedding"),
      h(10, $"id", lit(37)).cast("int").as("label")), "embeddings")

    println(s"[gendata] done: sf=$sf at $outDir")
  }
}
