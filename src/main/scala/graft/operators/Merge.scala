package graft.operators

import graft.api.{QueryModule, QuerySpec}
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General batch MERGE / upsert — the warehouse `MERGE INTO` surface
  * (reference: the Delta-table sinks at
  * `01_bronze_layer_ingestion.py:66-84` etc.; with no Delta in the jar set
  * this is the engine's first-class spelling of the upsert its users would
  * otherwise reach to Delta for, and the batch generalization of the
  * foreachBatch merges in [[graft.streaming.Scd2Stream]] /
  * `rel_cdc_apply`).
  *
  * Semantics (ANSI MERGE, latest-state source):
  * {{{
  *   MERGE INTO target USING source ON <keys>
  *     WHEN MATCHED AND <deleteWhen>      THEN DELETE
  *     WHEN MATCHED                       THEN UPDATE SET <updateCols from source>
  *     WHEN NOT MATCHED AND NOT deleteWhen THEN INSERT *
  * }}}
  *
  * Scale design: ONE full-outer shuffle join on the key — no driver-side
  * state, no collect, no per-row lookups. Both sides pack their non-key
  * columns into a single struct before the join, so the shuffle moves each
  * row once regardless of width and matched/unmatched detection is a null
  * check on the struct, robust to all-null data columns. At 100 TB the
  * target should be stored bucketed/partitioned by the merge key so the
  * nightly merge shuffles only the (much smaller) change set; AQE broadcasts
  * the source side automatically when a day's changes fit the broadcast
  * threshold.
  */
object Merge extends QueryModule {

  /** Apply `source` changes to `target` by `keys`.
    *
    * @param deleteWhen   boolean over SOURCE columns marking tombstones
    *                     (matched rows are deleted; unmatched tombstones
    *                     are no-ops)
    * @param updateCols   non-key columns taken from the source on match
    *                     (default: all of them — UPDATE SET *); columns not
    *                     listed keep the target's value
    * @param insertNotMatched WHEN NOT MATCHED THEN INSERT * (source rows
    *                     must carry every target column)
    *
    * Precondition (standard MERGE contract): at most one source row per
    * key — run the changelog through [[latestWins]] first otherwise.
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Column = lit(false),
      updateCols: Seq[String] = Nil,
      insertNotMatched: Boolean = true): DataFrame = {
    val dataCols = target.columns.toSeq.filterNot(keys.contains)
    val upd = (if (updateCols.isEmpty) dataCols else updateCols).toSet
    val t = target.select(keys.map(col) :+
      struct(dataCols.map(col): _*).as("__t"): _*)
    val s = source.select(keys.map(col) ++ Seq(
      struct(dataCols.map(col): _*).as("__s"),
      coalesce(deleteWhen, lit(false)).as("__del")): _*)
    val j = t.join(s, keys, "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val keep =
      (col("__t").isNotNull && col("__s").isNull) ||   // untouched target
      (matched && !col("__del")) ||                    // update (not delete)
      (col("__t").isNull &&                            // insert
        (if (insertNotMatched) !col("__del") else lit(false)))
    j.filter(keep).select(keys.map(col) ++ dataCols.map { c =>
      val take =
        if (upd(c)) when(col("__s").isNotNull, col(s"__s.$c")).otherwise(col(s"__t.$c"))
        else when(col("__t").isNotNull, col(s"__t.$c")).otherwise(col(s"__s.$c"))
      take.as(c)
    }: _*)
  }

  /** Collapse a changelog to its per-key latest row (the MERGE source
    * precondition): one shuffle on the key, row_number = 1 under the given
    * descending-priority ordering. */
  def latestWins(changes: DataFrame, keys: Seq[String],
      ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------------
  // Declared query: a three-way change set (updates, tombstones, inserts)
  // derived deterministically from `customer`, merged into `customer`.
  // Doublings (×2) rather than percentage bumps keep the update arithmetic
  // bit-exact in both engines.
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, QuerySpec] = Map(
    "rel_merge_upsert" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment", $"c_nationkey")
        val updates = cust.filter($"c_nationkey" < 10)
          .select($"c_custkey", ($"c_acctbal" * 2).as("c_acctbal"),
            $"c_mktsegment", $"c_nationkey", lit("upsert").as("op"))
        val tombstones = cust
          .filter($"c_nationkey" >= 20 && $"c_mktsegment" === "AUTOMOBILE")
          .withColumn("op", lit("delete"))
        val inserts = cust.filter($"c_nationkey" === 5)
          .select(($"c_custkey" + 10000000L).as("c_custkey"),
            lit(0.0).as("c_acctbal"), lit("NEW").as("c_mktsegment"),
            lit(5L).as("c_nationkey"), lit("upsert").as("op"))
        merge(cust, updates.unionAll(tombstones).unionAll(inserts),
          keys = Seq("c_custkey"), deleteWhen = $"op" === "delete")
      },
      oracle = Some("""
        WITH src AS (
          SELECT c_custkey, c_acctbal * 2 AS c_acctbal, c_mktsegment,
                 c_nationkey, 'upsert' AS op
          FROM customer WHERE c_nationkey < 10
          UNION ALL
          SELECT c_custkey, c_acctbal, c_mktsegment, c_nationkey, 'delete'
          FROM customer
          WHERE c_nationkey >= 20 AND c_mktsegment = 'AUTOMOBILE'
          UNION ALL
          SELECT c_custkey + 10000000, 0.0, 'NEW', 5, 'upsert'
          FROM customer WHERE c_nationkey = 5)
        SELECT t.c_custkey, t.c_acctbal, t.c_mktsegment, t.c_nationkey
        FROM customer t LEFT JOIN src s USING (c_custkey)
        WHERE s.c_custkey IS NULL
        UNION ALL
        SELECT s.c_custkey, s.c_acctbal, s.c_mktsegment, s.c_nationkey
        FROM customer t JOIN src s USING (c_custkey) WHERE s.op <> 'delete'
        UNION ALL
        SELECT s.c_custkey, s.c_acctbal, s.c_mktsegment, s.c_nationkey
        FROM src s LEFT JOIN customer t USING (c_custkey)
        WHERE t.c_custkey IS NULL AND s.op <> 'delete'""")))
}
