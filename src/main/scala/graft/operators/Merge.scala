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

  /** Snapshot diff — the audit complement of [[merge]]: classify every key
    * as `added` / `removed` / `changed` between two versions of a table,
    * with per-row attribution of WHICH data columns changed (null-safe
    * comparison). Unchanged keys are dropped, so the output is
    * |changes|-sized, not |table|-sized.
    *
    * Scale shape: the same ONE full-outer shuffle join on the key as
    * merge, both sides struct-packed (each row shuffles once regardless of
    * width); the column comparison is a codegen null-safe equality per
    * data column, no extra pass. At 100 TB, with both snapshots bucketed
    * by the key this is a co-located join; the output feeds compliance
    * audits, replication checks, and CDC backfills. */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = before.columns.toSeq.filterNot(keys.contains).sorted
    val b = before.select(keys.map(col) :+
      struct(dataCols.map(col): _*).as("__b"): _*)
    val a = after.select(keys.map(col) :+
      struct(dataCols.map(col): _*).as("__a"): _*)
    val changedArr = array(dataCols.map { c =>
      struct(lit(c).as("n"), (!(col(s"__b.$c") <=> col(s"__a.$c"))).as("ch"))
    }: _*)
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .otherwise(lit("changed")))
      .withColumn("__ca", changedArr)
      .withColumn("changed_cols",
        when(col("change") === "changed",
          expr("array_join(transform(filter(__ca, x -> x.ch), x -> x.n), ',')"))
          .otherwise(lit("")))
      // unchanged = matched with zero differing columns → dropped
      .filter(col("change") =!= "changed" || col("changed_cols") =!= "")
      .select(keys.map(col) ++ Seq(col("change"), col("changed_cols")): _*)
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
        WHERE t.c_custkey IS NULL AND s.op <> 'delete'""")),

    // ------------------------------------------------------------------
    // Snapshot diff: `orders` vs a deterministically mutated version —
    // some keys removed, some rows changed in one or both data columns,
    // some new keys inserted. Output = one row per CHANGED key with the
    // change class and the exact columns that differ; unchanged keys never
    // appear (|changes|-sized audit output). Doublings keep the mutated
    // values bit-exact in both engines.
    "rel_table_diff" -> QuerySpec(
      fn = (s, dir) => {
        import s.implicits._
        val before = t(s, dir, "orders")
          .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        val after = before
          .filter($"o_orderkey" % 89 =!= 0) // removed keys
          .select($"o_orderkey",
            when($"o_orderkey" % 97 === 0, $"o_totalprice" * 2)
              .otherwise($"o_totalprice").as("o_totalprice"),
            when($"o_orderkey" % 101 === 0, lit("X"))
              .otherwise($"o_orderstatus").as("o_orderstatus"))
          .unionAll(before.filter($"o_orderkey" % 103 === 0)
            .select(($"o_orderkey" + 100000000L).as("o_orderkey"),
              lit(1.0).as("o_totalprice"), lit("N").as("o_orderstatus")))
        diff(before, after, keys = Seq("o_orderkey"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
        a AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice,
                 CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                      ELSE o_orderstatus END AS o_orderstatus
          FROM b WHERE o_orderkey % 89 <> 0
          UNION ALL
          SELECT o_orderkey + 100000000, 1.0, 'N'
          FROM b WHERE o_orderkey % 103 = 0),
        j AS (
          SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
                 CASE WHEN b.o_orderkey IS NULL THEN 'added'
                      WHEN a.o_orderkey IS NULL THEN 'removed'
                      ELSE 'changed' END AS change,
                 CASE WHEN b.o_orderkey IS NULL OR a.o_orderkey IS NULL
                      THEN ''
                      ELSE array_to_string(list_filter([
                        CASE WHEN NOT (b.o_orderstatus IS NOT DISTINCT FROM
                                       a.o_orderstatus)
                             THEN 'o_orderstatus' END,
                        CASE WHEN NOT (b.o_totalprice IS NOT DISTINCT FROM
                                       a.o_totalprice)
                             THEN 'o_totalprice' END],
                        x -> x IS NOT NULL), ',') END AS changed_cols
          FROM b FULL JOIN a ON b.o_orderkey = a.o_orderkey)
        SELECT o_orderkey, change, changed_cols
        FROM j WHERE change <> 'changed' OR changed_cols <> ''""")))
}
