package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, Cast, Coalesce, EqualTo, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Materialized-view rollup rewrite — the aggregate twin of
  * [[JoinElimination]] (which deletes work a declaration proves
  * redundant) and [[ConsultSkippingIndex]] (which narrows a scan an
  * index proves prunable): once a rollup over a fact table is
  * registered, ANY subsumed aggregate query over that table is
  * transparently re-pointed at the tiny partial-aggregate table,
  * with no change at the query site.
  *
  * At 100 TB this is the difference between a dashboard refresh that
  * rescans the fact table and one that reads kilobytes: a grouped
  * SUM/COUNT/MIN/MAX over coarse keys touches every fact row on every
  * run, yet the answer is a pure function of one small rollup that a
  * nightly (or streaming) maintainer keeps current. Production
  * warehouses ship exactly this (Snowflake/BigQuery materialized
  * views, Calcite's `MaterializedViewRule`); core Spark has no MV
  * catalog, so the declaration + rule live here.
  *
  * '''The MV is an LSM of partial aggregates, not a finished answer.'''
  * Each maintenance step appends one `batch=<n>` partition holding the
  * increment's partial rollup ([[MaterializedView.refresh]] writes
  * batch 0; [[MaterializedView.appendDelta]] adds one batch per
  * append-only delta, cost proportional to the delta). The rewritten
  * plan ALWAYS re-aggregates over MV rows, so batches need no
  * read-time merge protocol and a coarser grouping than the MV's is
  * answered by the same re-aggregation that combines batches —
  * SUM-of-sums, MIN-of-mins, SUM-of-counts. Compaction = re-refresh.
  *
  * Matched shapes: `Aggregate(G, aggs, [Filter]/[Project]* → scan(fact))`
  * and — for a star registration ([[MaterializedView.MvJoin]]) —
  * `Aggregate(G, aggs, …(Join_inner(scan(fact), scan(dim)) ON fk = dk))`
  * in either child order, where the fact scan's canonical root path is
  * registered. Projects may carry deterministic aliases (the optimizer's
  * own `PullOutGroupingExpressions` shape, `withColumn` spellings); their
  * definitions are inlined back to scan attributes before matching.
  * Every element of `G` and every predicate column must land on an MV
  * grouping column — a bare stored attribute (fact or dim side) or an
  * expression semantically equal to a declared `derived` bucket — and
  * every aggregate must be derivable from the MV's declared partials:
  *
  *   - `sum(x)` (x integral/decimal) and the engine's exact spelling
  *     `sum(cast(x as decimal(30,6)))` ([[graft.api.Exact.dsum]]) →
  *     `sum(sum_x)` over the decimal partial. A BARE float sum is
  *     NEVER rewritten: re-associated double addition drifts in the
  *     low bits, and results must be bit-identical to the unrewritten
  *     plan. Arbitrary arithmetic AROUND aggregate calls
  *     (`dsum(x).cast("double")`, `dsum(x)/count(x)` — avg) is kept
  *     verbatim and re-derived structurally.
  *   - `count(*)`/`count(1)` → `coalesce(sum(cnt_star), 0)` (the
  *     coalesce preserves `count`'s never-null contract when a global
  *     aggregate runs over an empty fact table)
  *   - `count(x)` → `coalesce(sum(cnt_x), 0)`
  *   - `min(x)`/`max(x)` → `min(min_x)`/`max(max_x)`
  *   - derived-MEASURE partials ([[MaterializedView.MvSumD]] /
  *     [[MaterializedView.MvMinD]] / [[MaterializedView.MvMaxD]]):
  *     `sum(cast(E as decimal(30,6)))` / `min(E)` / `max(E)` for a
  *     declared expression `E`, matched semantically the way derived
  *     grouping buckets are — expression rollups (revenue) and sketch
  *     rollups (an HLL register table is a grouping-by-register MV with
  *     a `MvMaxD` rank measure) ride the same machinery.
  *
  *   - bare `avg(x)` (x integral/fitting-decimal) → the re-derived sum
  *     and count substituted into the Average's OWN `evaluateExpression`
  *     (so the final division's type algebra is Spark's verbatim);
  *     requires BOTH `MvSum(x)` and `MvCount(x)` partials. The davg
  *     spelling (`dsum(x)/count(x)`) rides the structural path.
  *
  * A HAVING clause needs no special casing: it analyzes to a Filter
  * ABOVE the Aggregate, the rule rewrites the Aggregate underneath it,
  * and the filter's references resolve against the rewritten aggregate's
  * preserved output exprIds — `rel_mv_having` + the spec pin it.
  *
  * Anything else — a bare FLOAT sum/avg (re-association drifts),
  * DISTINCT, FILTER clauses, expressions over grouping columns, a
  * predicate on a non-grouping column — leaves the plan untouched: the
  * rewrite is an optimization, never a semantics change, and falling
  * through always yields the correct (just slower) scan-the-fact plan.
  *
  * '''Staleness can disable the rewrite but never corrupt a result.'''
  * Registration fingerprints the fact scan's file listing as a 32-byte
  * order-insensitive digest over (path, size, mtime) per file
  * ([[MaterializedView.ListingDigest]] — O(1) driver residency at any
  * table size; the freshness probe folds the same listing the planner
  * already holds in its
  * [[org.apache.spark.sql.execution.datasources.FileIndex]], so the
  * check costs no extra I/O at plan time). A query whose scan listing
  * differs from the fingerprint is NOT rewritten — a compacted,
  * overwritten, or grown fact table silently falls back to the direct
  * plan until the maintainer runs ([[MaterializedView.appendDelta]]
  * re-fingerprints after folding the delta in). What the fingerprint
  * cannot see is a registration built from a strict subset of the
  * rows in those same files — `register` reads the source path itself
  * to make that misdeclaration impossible.
  *
  * Injected via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]); per-session kill switch
  * `spark.graft.mv.rewrite=false`. `MaterializedViewSpec` pins the
  * plan shape (MV scanned, fact not), the fall-through shapes, and
  * bit-equality against the unrewritten plan; `rel_mv_rollup` /
  * `rel_mv_filtered` / `rel_mv_incremental` hash-check the rewritten
  * plans against DuckDB running the direct aggregation.
  */
object MaterializedView {

  /** One derivable partial. `col` is the fact column; the MV column it
    * materializes is `named` (e.g. `sum_l_quantity`). */
  sealed trait MvAgg { def col: String; def named: String }
  final case class MvSum(col: String) extends MvAgg { def named = s"sum_$col" }
  final case class MvMin(col: String) extends MvAgg { def named = s"min_$col" }
  final case class MvMax(col: String) extends MvAgg { def named = s"max_$col" }
  final case class MvCount(col: String) extends MvAgg { def named = s"cnt_$col" }
  case object MvCountStar extends MvAgg { def col = "*"; def named = "cnt_star" }

  /** Derived-MEASURE partials: the aggregate of an EXPRESSION over source
    * columns, declared as SQL and matched SEMANTICALLY at rewrite time
    * (the `derived` grouping-column treatment applied to the measure
    * side). This is what serves
    *   - expression rollups — `MvSumD("revenue",
    *     "l_extendedprice * (1 - l_discount)")` answers the classic
    *     revenue dashboard; the query must spell the exact-decimal sum
    *     ([[graft.api.Exact.dsum]]'s `sum(cast(e as decimal(30,6)))`),
    *     which is also what the partial stores, so re-aggregation stays
    *     bit-identical (a bare float expression sum is never rewritten,
    *     same as the stored-column rule), and
    *   - sketch rollups — an MV at (group, register) grain with
    *     `MvMaxD` over the rank expression IS a maintained HyperLogLog
    *     ([[graft.functions.Hll]]): per-register MAX re-aggregation
    *     across batch partitions is exactly sketch union, so a
    *     count-distinct dashboard reads kilobytes of registers instead
    *     of the fact table, and stays exact-to-the-sketch under
    *     incremental maintenance.
    * MIN/MAX re-add exactly for any type, so `MvMinD`/`MvMaxD` carry no
    * type restriction. */
  final case class MvSumD(name: String, sql: String) extends MvAgg {
    def col: String = sql; def named = s"sum_$name"
  }
  final case class MvMinD(name: String, sql: String) extends MvAgg {
    def col: String = sql; def named = s"min_$name"
  }
  final case class MvMaxD(name: String, sql: String) extends MvAgg {
    def col: String = sql; def named = s"max_$name"
  }

  /** One link of the star/snowflake extension: the MV's source relation
    * gains `INNER JOIN parquet(dimPath) ON leftKey = dimKey`, where
    * `leftKey` may live on the fact table OR on any earlier-declared
    * dimension (the snowflake chain: lineitem ⋈ orders by l_orderkey,
    * then orders ⋈ customer by o_custkey). `groupCols`/`derived` may
    * then name columns of ANY joined table — the Calcite-
    * `MaterializedViewRule` shape (rollup by order priority, by customer
    * nation, …) that answers a dashboard's multi-dimension aggregate
    * without touching any table. The rewrite matches the query's OWN
    * inner equi-join tree on the same key pairs (any join order/shape);
    * every dimension is fingerprinted alongside the fact, and a changed
    * dimension refuses incremental maintenance (a delta folded under a
    * different dim version would be inconsistent) — rebuild with
    * [[register]]. `factKey` is the left-side key name, kept as-named
    * because the single-dim case reads naturally. */
  final case class MvJoin(dimPath: String, factKey: String, dimKey: String)

  /** A registered rollup: partial aggregates `aggs` grouped by
    * `groupCols` (stored source columns) plus `derived` grouping columns —
    * (mv column name, SQL expression over source columns), e.g.
    * `("hour", "date_trunc('HOUR', ts)")` for the time-bucketed rollup
    * every metrics dashboard wants. Derived expressions are matched
    * SEMANTICALLY at rewrite time (the declared SQL is resolved against
    * the query's own scan, analyzer-normalized timezone and all, then
    * compared by `semanticEquals`), so the query spells the bucket
    * however it likes. With `joins` declared the source relation is the
    * fact ⋈ dim₁ ⋈ … star/snowflake join ([[MvJoin]], in declaration
    * order). Stored as batch partitions under `mvPath`. */
  final case class MvDef(groupCols: Seq[String], aggs: Seq[MvAgg],
      mvPath: String, derived: Seq[(String, String)] = Nil,
      joins: Seq[MvJoin] = Nil)

  /** O(1)-RESIDENCY fingerprint of a source file listing: an
    * order-insensitive 128-bit multiset hash (XOR of per-file MD5 over
    * `path|len|mtime`) plus file count and total bytes. Storing the full
    * listing per registration would be O(files × path-length) of
    * permanent driver state — ~250 MB per MV at the 1M-file scale of a
    * 100 TB fact table (the same wrong residency shape the skipping
    * index had before its 8 KB cap); the digest is 32 bytes whatever the
    * table size. The freshness probe still folds the planner's own
    * cached listing (O(files) time, as before — it never re-lists), just
    * without materializing a second copy of it. A false "fresh" needs an
    * MD5-XOR multiset collision at equal count AND equal total bytes
    * between the registered and current listings — not a reachable
    * failure mode for non-adversarial file churn. */
  private[plans] final case class ListingDigest(
      count: Long, bytes: Long, lo: Long, hi: Long)

  private[plans] final class DigestBuilder {
    private var count = 0L
    private var bytes = 0L
    private var lo = 0L
    private var hi = 0L
    def add(path: String, len: Long, mtime: Long): Unit = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$path|$len|$mtime"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var l = 0L; var h = 0L; var i = 0
      while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
      while (i < 16) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      lo ^= l; hi ^= h; count += 1; bytes += len
    }
    def result(): ListingDigest = ListingDigest(count, bytes, lo, hi)
  }

  private[plans] final case class Registered(dfn: MvDef,
      @volatile var sig: ListingDigest,
      @volatile var dimSigs: Seq[ListingDigest]) // aligned with dfn.joins

  // canonical fact root path -> registrations (a fact table can carry
  // several rollups — plain, time-bucketed, star — and one appendDelta
  // maintains them all). Session-scoped state would need the rule to
  // thread the session; like SkippingIndex's auto registry this is
  // JVM-scoped, keyed by the canonical path so two sessions over the
  // same warehouse share the declaration.
  private val registry = new ConcurrentHashMap[String, List[Registered]]()

  private def put(key: String, reg: Registered): Unit = {
    registry.compute(key, (_, old) =>
      reg :: Option(old).getOrElse(Nil).filterNot(_.dfn.mvPath == reg.dfn.mvPath))
    ()
  }

  /** Registry/digest key: the FULLY QUALIFIED URI (scheme + authority +
    * path). Keying on the bare path would alias tables on different
    * filesystems with identical paths into one registry entry, and a
    * byte-preserving mirror (distcp keeping sizes/mtimes) could then pass
    * the freshness probe against the wrong registration. */
  private[plans] def canon(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toUri.toString
  }

  private def listingOf(spark: SparkSession, path: String): ListingDigest = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val b = new DigestBuilder
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (s.isFile && !name.startsWith("_") && !name.startsWith("."))
        b.add(s.getPath.toUri.toString, s.getLen, s.getModificationTime)
    }
    b.result()
  }

  /** The decimal type every sum partial accumulates in — the engine's
    * [[graft.api.Exact]] discipline: a re-associated double sum drifts in
    * the low bits, an exact-decimal one re-adds to the same value under
    * ANY partitioning, which is what lets batch partitions re-aggregate
    * bit-exactly. */
  val SumDec: DecimalType = DecimalType(30, 6)

  /** The partial rollup of `rows` under `dfn` — the ONE aggregation both
    * maintenance paths run (refresh over the full source, appendDelta
    * over the increment). */
  private def partial(rows: DataFrame, dfn: MvDef): DataFrame = {
    // Star/snowflake MV: the source relation is the declared join chain.
    // Each link's left key resolves against the ACCUMULATED join (fact or
    // any earlier dim — the snowflake shape); aliases keep the dim-side
    // key unambiguous, and every other referenced column must be
    // unambiguous by name across the joined schemas or this build fails
    // loudly at register time (which is what makes name-keyed matching
    // in the rewrite safe: an ambiguous declaration cannot register).
    val src = dfn.joins.zipWithIndex.foldLeft(rows.alias("__mv_fact")) {
      case (acc, (j, i)) =>
        val dim = rows.sparkSession.read.parquet(j.dimPath).alias(s"__mv_dim$i")
        acc.join(dim,
          acc(j.factKey) === col(s"__mv_dim$i.${j.dimKey}"), "inner")
    }
    // An MvSum partial stores cast(x as decimal(30,6)). For a decimal
    // source with scale > 6 that cast ROUNDS, and with precision − scale
    // > 24 it can overflow to null (non-ANSI) and silently drop rows —
    // the rewritten bare sum(x) would then differ from the direct plan.
    // Such a declaration can never be served soundly; refuse it loudly
    // at build time rather than let the rewrite-side guard carry alone.
    dfn.aggs.foreach {
      case MvSum(c) => src.schema(c).dataType match {
        case d: DecimalType if d.scale > SumDec.scale ||
            d.precision - d.scale > SumDec.precision - SumDec.scale =>
          throw new IllegalArgumentException(
            s"MvSum($c): source type $d does not fit the sum partial's " +
              s"$SumDec (scale > ${SumDec.scale} rounds; integral digits " +
              s"> ${SumDec.precision - SumDec.scale} can overflow to " +
              "null) — declare MvSumD(\"" + c + "\", \"" + c + "\") " +
              "instead: it serves the exact-decimal dsum spelling, the " +
              "only sum shape the rewrite could soundly serve here anyway")
        case _ =>
      }
      case _ =>
    }
    val aggCols = dfn.aggs.map {
      case MvSum(c)   => sum(col(c).cast(SumDec)).as(s"sum_$c")
      case MvMin(c)   => min(col(c)).as(s"min_$c")
      case MvMax(c)   => max(col(c)).as(s"max_$c")
      case MvCount(c) => count(col(c)).as(s"cnt_$c")
      case MvCountStar => count(lit(1)).as("cnt_star")
      case m @ MvSumD(_, sql) => sum(expr(sql).cast(SumDec)).as(m.named)
      case m @ MvMinD(_, sql) => min(expr(sql)).as(m.named)
      case m @ MvMaxD(_, sql) => max(expr(sql)).as(m.named)
    }
    val withDerived = dfn.derived.foldLeft(src) {
      case (df, (n, sql)) => df.withColumn(n, expr(sql))
    }
    val keys = dfn.groupCols.map(col) ++ dfn.derived.map { case (n, _) => col(n) }
    withDerived.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  private def writeBatch(rows: DataFrame, dfn: MvDef, batch: Long): Unit = {
    partial(rows, dfn).write.mode("overwrite")
      .parquet(s"${dfn.mvPath}/batch=$batch")
    mvGen.merge(dfn.mvPath, 1L, (a, b) => a + b); ()
  }

  // ---- plan-time MV-scan cache ---------------------------------------
  // The rule needs the MV table's analyzed relation to re-derive columns.
  // Optimizer batches run to fixed point (the rule fires several times per
  // query), so reading the parquet footer per invocation would tax every
  // served query. Cache the relation per mvPath, invalidated by a
  // generation counter every writeBatch bumps; each USE gets newInstance()
  // (fresh exprIds) so two aggregates served in one plan tree never share
  // attribute ids.
  private val mvGen = new ConcurrentHashMap[String, java.lang.Long]()
  private val mvScanCache =
    new ConcurrentHashMap[String, (Long, org.apache.spark.sql.execution.datasources.LogicalRelation)]()

  private[plans] def scanOf(spark: SparkSession, mvPath: String)
      : org.apache.spark.sql.execution.datasources.LogicalRelation = {
    val hit = mvScanCache.get(mvPath)
    val base = if (hit != null && hit._1 == mvGen.getOrDefault(mvPath, 0L))
      hit._2
    else {
      // Cold read: complete a compaction a DIFFERENT maintainer crashed
      // mid-swap — but ONLY when no maintainer holds the lease. The
      // manifest alone cannot tell a crashed maintainer from a LIVE one:
      // a cold read racing a live compactor's swap could otherwise run
      // names.foreach(delete) after the compactor's rename(tmp, dest) and
      // delete the merged batches' only copy. The compactor holds the
      // lease for the manifest's whole lifetime, so manifest-present ∧
      // lease-absent can only mean a crashed-and-broken holder (recovery
      // safe) — a crashed holder that still HAS the lease defers recovery
      // to the operator's MaintenanceLease.break, as documented there.
      // (Cheap: two fs.exists when there is nothing to recover.) A
      // same-JVM cache hit over a concurrently-swapped listing fails
      // LOUDLY (deleted files), never silently wrong — compaction
      // preserves content, so any listing that still reads fully is a
      // correct answer.
      val root = new Path(mvPath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!graft.sources.MaintenanceLease.isHeld(fs, root) &&
          finishSwap(fs, root))
        mvGen.merge(mvPath, 1L, (a, b) => a + b)
      val gen: Long = mvGen.getOrDefault(mvPath, 0L)
      val lr = spark.read.parquet(mvPath).queryExecution.analyzed
        .collectFirst {
          case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
        }.getOrElse(throw new IllegalStateException(
          s"MV at $mvPath did not analyze to a file relation"))
      mvScanCache.put(mvPath, (gen, lr))
      lr
    }
    base.newInstance()
  }

  // ---- LSM compaction ------------------------------------------------

  /** Merge of already-partial MV rows: the same re-aggregation the serve
    * plan runs (sum of sums, min of mins, sum of counts), so compaction
    * preserves every servable answer bit-for-bit — it only collapses the
    * per-batch duplication of group rows. Exactness is the [[SumDec]]
    * discipline again: decimal/integral re-addition and MIN/MAX are
    * order-insensitive. */
  private def mergePartials(rows: DataFrame, dfn: MvDef): DataFrame = {
    val keys = (dfn.groupCols ++ dfn.derived.map(_._1)).map(col)
    val aggCols = dfn.aggs.map {
      case a @ (_: MvSum | _: MvSumD | _: MvCount | MvCountStar) =>
        sum(col(a.named)).as(a.named)
      case a @ (_: MvMin | _: MvMinD) => min(col(a.named)).as(a.named)
      case a @ (_: MvMax | _: MvMaxD) => max(col(a.named)).as(a.named)
    }
    rows.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Complete (or discard) a crashed compaction swap — the
    * [[graft.llm.MmFeatures.compactBatches]] manifest-last discipline:
    * the manifest names exactly the batch dirs a rewrite replaces; its
    * presence plus the `_merged` marker tells merged output from a
    * not-yet-deleted original at the same path, so no crash point can
    * delete the only copy and re-entry is idempotent. */
  private def finishSwap(fs: org.apache.hadoop.fs.FileSystem, root: Path): Boolean = {
    val tmp = new Path(root, ".compact_tmp_batches")
    val manifest = new Path(root, ".compact_manifest")
    if (!fs.exists(manifest)) return false
    val names = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(manifest)),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    val destName = names.minBy(_.stripPrefix("batch=").toLong)
    val dest = new Path(root, destName)
    if (fs.exists(new Path(dest, "_merged"))) {
      // Rename already happened: clear straggler originals and tmp.
      names.filter(_ != destName).foreach { n =>
        val p = new Path(root, n)
        if (fs.exists(p)) fs.delete(p, true)
      }
      if (fs.exists(tmp)) fs.delete(tmp, true)
    } else if (fs.exists(new Path(tmp, "_merged"))) {
      // Merged data still in tmp: delete originals, then swap it in.
      names.foreach { n =>
        val p = new Path(root, n)
        if (fs.exists(p)) fs.delete(p, true)
      }
      fs.rename(tmp, dest)
    }
    // else: aborted before tmp completed — originals untouched.
    fs.delete(manifest, false) // LAST: commit point
    true // the table may have changed shape — cached listings must drop
  }

  /** Compact every rollup registered on `sourcePath`: all but the newest
    * `keepLast` batch partitions re-aggregate into the lowest-id one.
    * The serve path re-aggregates anyway, so answers are BIT-IDENTICAL
    * before and after — what compaction bounds is the read cost a
    * streamed maintainer accrues (one `batch=` dir per trigger: after a
    * day of minutely triggers the scan reads 1,440 small files; after
    * compaction, ~|groups| rows in one).
    *
    * `keepLast ≥ 1` preserves streaming replay idempotence: only the
    * newest batch id can be replayed after a crash ([[streamBatch]]
    * overwrites its own dir), and that dir is never merged away.
    * Single-maintainer lease + manifest-last swap; a crashed run
    * completes on the next leased [[compact]], or on the next cold
    * [[scanOf]] once the dead holder's lease is broken (read-path
    * recovery gates on lease absence — it cannot tell a crashed
    * maintainer from a live one otherwise). */
  def compact(spark: SparkSession, sourcePath: String, keepLast: Int = 1)
      : Seq[(String, Int, Int)] = {
    val key = canon(spark, sourcePath)
    val regs = Option(registry.get(key)).getOrElse(Nil)
    require(regs.nonEmpty, s"no MV registered for $key")
    regs.map { reg =>
      val (b, a) = compactMv(spark, reg.dfn, keepLast)
      (reg.dfn.mvPath, b, a)
    }
  }

  private def compactMv(spark: SparkSession, dfn: MvDef, keepLast: Int)
      : (Int, Int) = {
    val root = new Path(dfn.mvPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lease = graft.sources.MaintenanceLease.acquire(
      fs, root, "MaterializedView.compact")
    try {
      // Complete a crashed prior run first; if that changed the table,
      // cached plan-time listings must drop even when this run then has
      // nothing of its own to merge.
      if (finishSwap(fs, root)) mvGen.merge(dfn.mvPath, 1L, (a, b) => a + b)
      val batches = fs.listStatus(root).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .map(_.getPath.getName)
        .sortBy(_.stripPrefix("batch=").toLong)
      val nBefore = batches.length
      val toMerge = batches.dropRight(math.max(keepLast, 1))
      if (toMerge.length <= 1) return (nBefore, nBefore)
      val tmp = new Path(root, ".compact_tmp_batches")
      fs.delete(tmp, true)
      mergePartials(
        spark.read.parquet(toMerge.map(n => s"${dfn.mvPath}/$n"): _*), dfn)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      fs.create(new Path(tmp, "_merged"), true).close()
      // Manifest committed ATOMICALLY (write-then-rename): a concurrent
      // cold reader must see either no manifest or the complete name
      // list — a truncated list would recover a partial swap.
      val manifestTmp = new Path(root, ".compact_manifest.inprogress")
      fs.delete(manifestTmp, false)
      val out = fs.create(manifestTmp, true)
      out.write(toMerge.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      fs.rename(manifestTmp, new Path(root, ".compact_manifest"))
      finishSwap(fs, root)
      mvGen.merge(dfn.mvPath, 1L, (a, b) => a + b)
      (nBefore, nBefore - toMerge.length + 1)
    } finally graft.sources.MaintenanceLease.release(fs, lease)
  }

  /** Build (or rebuild) the rollup from the COMPLETE source at
    * `sourcePath` and register it for automatic rewrite. Reading the
    * source path itself — rather than accepting a caller DataFrame —
    * is what ties the fingerprint to the rows: a registration can
    * never cover files whose rows it did not aggregate.
    *
    * The build is BRACKETED by listings: files landing between the
    * pre-listing and the scan would be aggregated into batch 0 yet absent
    * from the digest — covered-but-unfingerprinted, so a later
    * [[appendDelta]] whose caller treats them as new would re-add their
    * rows AND advance the fingerprint, silently double-counting. If the
    * post-build listing differs from the pre-build one, the build retries
    * against the new listing (bounded), so the adopted digest always
    * matches exactly the files whose rows were aggregated. */
  def register(spark: SparkSession, sourcePath: String, dfn: MvDef): Unit = {
    // Rebuild prologue: drop any prior registration of this mvPath FIRST,
    // so (a) the rebuild's own partial aggregation cannot be served from
    // the very MV it is about to clear (same grouping, fresh fingerprint
    // — it WOULD match), and (b) concurrent queries fall back to the
    // direct plan during the rebuild window instead of racing a
    // half-built rollup.
    registry.computeIfPresent(canon(spark, sourcePath), (_, old) =>
      old.filterNot(_.dfn.mvPath == dfn.mvPath) match {
        case Nil => null
        case l => l
      })
    var attempt = 0
    var done = false
    while (!done) {
      val sig = listingOf(spark, sourcePath)
      val dimSigs = dfn.joins.map(j => listingOf(spark, j.dimPath))
      clearBatches(spark, dfn.mvPath) // a REBUILD must not leave stale
      // batch=n>0 partitions from a prior registration double-counting
      // under the fresh batch 0.
      writeBatch(spark.read.parquet(sourcePath), dfn, 0L)
      if (sig == listingOf(spark, sourcePath) &&
          dimSigs == dfn.joins.map(j => listingOf(spark, j.dimPath))) {
        put(canon(spark, sourcePath), Registered(dfn, sig, dimSigs))
        done = true
      } else {
        attempt += 1
        require(attempt < 3,
          s"source $sourcePath (or its dimension) changed during every " +
            "register() attempt — retry during a quieter window, or use " +
            "the streamed maintainer (MvStream) for a live landing zone")
      }
    }
  }

  /** Drop every `batch=` partition under `mvPath` (rebuild prologue). */
  private def clearBatches(spark: SparkSession, mvPath: String): Unit = {
    val root = new Path(mvPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        if (st.isDirectory && st.getPath.getName.startsWith("batch="))
          fs.delete(st.getPath, true)
      }
      mvGen.merge(mvPath, 1L, (a, b) => a + b); ()
    }
  }

  /** XOR-fold of `files`' (path, len, mtime) hashes onto `base`: the
    * multiset digest the source WOULD have if exactly `files` were added
    * to the listing `base` fingerprints. O(delta) — the full old file set
    * is never needed, which is what keeps registrations at 32 bytes. */
  private def extendDigest(spark: SparkSession, base: ListingDigest,
      files: Seq[String]): ListingDigest = {
    val b = new DigestBuilder
    files.foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(p)
      b.add(fs.makeQualified(p).toUri.toString, st.getLen,
        st.getModificationTime)
    }
    val d = b.result()
    ListingDigest(base.count + d.count, base.bytes + d.bytes,
      base.lo ^ d.lo, base.hi ^ d.hi)
  }

  /** Fold an append-only delta in: ONE partial rollup of `deltaRows`
    * (cost ∝ delta) appended as the next batch partition, then the
    * fingerprint advances to the source's current listing. Caller
    * contract (the same one every incremental maintainer here has —
    * [[graft.streaming.Medallion]]'s layers, [[graft.llm.TextFeatures]]
    * batches): `deltaRows` are exactly the rows of the files added
    * since the last register/appendDelta, and the source is
    * append-only between maintenance runs.
    *
    * '''The contract is VERIFIED whenever it is checkable.''' When
    * `deltaRows` scans files under `sourcePath` itself, the digest's
    * XOR-multiset structure proves or refutes coverage exactly: folding
    * the delta files' hashes onto the registered digest must reproduce
    * the current listing's digest. A mismatch — the caller's delta is
    * not exactly the files added since the last maintenance (a file
    * landed in the caller's compute-to-call gap, or the caller re-sent
    * already-folded files) — refuses BEFORE anything is written, since
    * folding a wrong delta would over- or under-count served answers
    * forever. When the delta was materialized from elsewhere (a caller
    * that appended rows it already held), provenance is unverifiable
    * and the fingerprint advance falls back to trusting the contract. */
  def appendDelta(spark: SparkSession, sourcePath: String,
      deltaRows: DataFrame): Unit = {
    val key = canon(spark, sourcePath)
    val regs = registry.get(key)
    require(regs != null && regs.nonEmpty, s"no MV registered for $key")
    val sig = listingOf(spark, sourcePath)
    val inputs = deltaRows.inputFiles.toSeq
    val srcPrefix = canon(spark, sourcePath).stripSuffix("/") + "/"
    val verifiable = inputs.nonEmpty && inputs.forall(_.startsWith(srcPrefix))
    regs.foreach { reg =>
      if (verifiable)
        require(extendDigest(spark, reg.sig, inputs) == sig,
          s"deltaRows scans ${inputs.length} file(s) under $sourcePath " +
            s"that are NOT exactly the files added since the last " +
            s"maintenance of ${reg.dfn.mvPath} — refusing to fold (a " +
            "wrong delta would permanently over- or under-count served " +
            "answers). Pass exactly the new files' rows, or rebuild " +
            "with register().")
      // A star MV's delta rollup joins the CURRENT dimensions; folding it
      // under a dim version the earlier batches never saw would mix the
      // two silently. Refuse loudly — a changed dim needs register().
      reg.dfn.joins.zip(reg.dimSigs).foreach { case (j, ds) =>
        require(ds == listingOf(spark, j.dimPath),
          s"dimension ${j.dimPath} changed since registration of " +
          s"${reg.dfn.mvPath}; incremental maintenance would mix dim " +
          "versions — rebuild with register()")
      }
      val fs = new Path(reg.dfn.mvPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val next = fs.listStatus(new Path(reg.dfn.mvPath))
        .map(_.getPath.getName).collect {
          case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong
        }.max + 1L
      writeBatch(deltaRows, reg.dfn, next)
      reg.sig = sig
    }
  }

  def deregister(spark: SparkSession, sourcePath: String): Unit = {
    registry.remove(canon(spark, sourcePath)); ()
  }

  /** Test seam: force the next [[scanOf]] for `mvPath` onto the cold path
    * (a generation bump — the same effect every maintenance write has).
    * Lets specs exercise cold-read recovery without a fresh JVM. */
  private[graft] def invalidateCache(mvPath: String): Unit = {
    mvGen.merge(mvPath, 1L, (a, b) => a + b); ()
  }

  // ---- streamed maintenance ([[graft.streaming.MvStream]]) ----------

  /** An opaque point-in-time listing of a source directory. Take one
    * BEFORE a streaming drain starts and one AFTER it ends: when the two
    * [[SourceSnapshot.matches match]], the drain's frozen listing (which
    * sits between them in time) is exactly the snapshot, so the adopted
    * fingerprint covers precisely the drained files — see
    * [[graft.streaming.MvStream.runAvailableNow]]'s bracket loop. */
  final class SourceSnapshot private[plans] (private[plans] val sig: ListingDigest) {
    /** Same listing? (count, bytes, and XOR-multiset hash all equal) */
    def matches(other: SourceSnapshot): Boolean = sig == other.sig
  }

  def snapshot(spark: SparkSession, sourcePath: String): SourceSnapshot =
    new SourceSnapshot(listingOf(spark, sourcePath))

  /** One micro-batch's partial rollup, keyed by the STREAMING batch id:
    * a replayed batch overwrites its own `batch=` dir — exactly-once
    * without a transaction log (the [[graft.streaming.CdfStream]]
    * discipline). The stream's ids and [[appendDelta]]'s max+1 ids share
    * one sequence, so batch maintenance can continue a drained stream. */
  def streamBatch(rows: DataFrame, dfn: MvDef, batchId: Long): Unit =
    writeBatch(rows, dfn, batchId)

  /** Register an MV whose batches were written by a streamed maintainer
    * (no rebuild — the drain already did the work). `snap` must be the
    * [[snapshot]] taken before the drain started: the declaration is
    * "every row of these files is in some batch", which AvailableNow's
    * frozen listing guarantees for exactly the files in the snapshot. */
  def adopt(spark: SparkSession, sourcePath: String, dfn: MvDef,
      snap: SourceSnapshot): Unit =
    put(canon(spark, sourcePath),
      Registered(dfn, snap.sig, dfn.joins.map(j => listingOf(spark, j.dimPath))))

  /** The registrations covering a scan rooted at `rootPath` (the planner
    * hands qualified root paths, so the URI string matches [[canon]]). */
  private[plans] def lookup(rootPath: Path): List[Registered] =
    Option(registry.get(rootPath.toUri.toString)).getOrElse(Nil)

  private[plans] def sigOf(files: Seq[org.apache.spark.sql.execution.datasources.FileStatusWithMetadata]): ListingDigest = {
    val b = new DigestBuilder
    files.foreach(f =>
      b.add(f.getPath.toUri.toString, f.getLen, f.getModificationTime))
    b.result()
  }
}

/** The optimizer rule — see [[MaterializedView]]. */
case class RewriteToMv(spark: SparkSession) extends Rule[LogicalPlan] {

  import MaterializedView._

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite", "true") == "true"

  /** Unwrap `[Filter] / [Project]*` down to a single-root v1 file scan,
    * conjoining filter predicates and collecting project lists top-down.
    * Projects may carry deterministic Alias entries — the optimizer's own
    * `PullOutGroupingExpressions` rewrites `GROUP BY f(x)` into exactly
    * that shape (`Project [.., f(x) AS _groupingexpression]`) before this
    * rule runs, and user `withColumn` spellings produce it too. The
    * collected aliases are inlined back by [[inliner]] so matching always
    * happens over the scan's own attributes. */
  private def unwrap(p: LogicalPlan, conds: Seq[Expression],
      projects: Seq[Seq[NamedExpression]]): Option[(Seq[Expression],
      Seq[Seq[NamedExpression]], LogicalRelation, HadoopFsRelation)] =
    p match {
      case Filter(c, ch) => unwrap(ch, conds :+ c, projects)
      case Project(pl, ch) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => rebindable(al.child)
          case _ => false
        } => unwrap(ch, conds, projects :+ pl)
      case lr @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.rootPaths.length == 1 =>
        Some((conds, projects, lr, r))
      case _ => None
    }

  /** Substitutes every alias the unwrapped Projects defined by its
    * defining expression, fully resolved down to scan attributes (lower
    * projects first, so upper aliases over lower aliases inline through). */
  private def inliner(projects: Seq[Seq[NamedExpression]])
      : Expression => Expression = {
    val m = projects.reverse.foldLeft(
        Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Expression]) {
      (acc, pl) => acc ++ pl.collect { case al: Alias =>
        al.exprId -> al.child.transformUp {
          case a: AttributeReference if acc.contains(a.exprId) => acc(a.exprId)
        }
      }
    }
    e => e.transformUp {
      case a: AttributeReference if m.contains(a.exprId) => m(a.exprId)
    }
  }

  /** Semantic equality modulo spellings Spark itself treats as
    * case-insensitive: `date_trunc('HOUR', ts)` and `date_trunc('hour',
    * ts)` are the same computation, but their format LITERALS differ and
    * plain `semanticEquals` would refuse the match (found via the SQL
    * door, which conventionally spells units uppercase). Only the
    * trunc-family format literal is normalized — `date_format` patterns
    * are genuinely case-sensitive and stay untouched. */
  private def semEq(a: Expression, b: Expression): Boolean = {
    def norm(e: Expression): Expression = e.transformUp {
      case t: org.apache.spark.sql.catalyst.expressions.TruncTimestamp =>
        t.format match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, dt) =>
            t.copy(format = Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                s.toString.toLowerCase(java.util.Locale.ROOT)), dt))
          case _ => t
        }
      case t: org.apache.spark.sql.catalyst.expressions.TruncDate =>
        t.format match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, dt) =>
            t.copy(format = Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                s.toString.toLowerCase(java.util.Locale.ROOT)), dt))
          case _ => t
        }
    }
    norm(a).semanticEquals(norm(b))
  }

  /** A predicate safe to re-bind onto the MV: deterministic (a random
    * filter selects fact ROWS; re-bound it would select GROUPS — a
    * different computation) and subquery-free (a subquery's own plan
    * is opaque to the remap). */
  private def rebindable(e: Expression): Boolean =
    e.deterministic && !e.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        rewrite(agg, groupExprs, aggExprs, child).getOrElse(agg)
    }
  }

  /** The declared derived grouping expressions, resolved against the
    * query's OWN relation(s) (same attribute exprIds, analyzer-normalized
    * timezone), so `semanticEquals` against query expressions is exact.
    * None when any declaration fails to resolve — no rewrite. For star
    * MVs `rel` is a bare fact⋈dim Join over the query's two scans and the
    * resolved attributes may land on branch-level aliases — `inline`
    * reduces both sides to scan attributes before comparison. */
  private def bindDerived(rel: LogicalPlan, pairs: Seq[(String, String)],
      inline: Expression => Expression): Option[Seq[(String, Expression)]] =
    seqOpt(pairs.map { case (n, sql) =>
      scala.util.Try {
        // OPTIMIZED, not just analyzed: the rule compares against query
        // expressions captured mid-optimization (after constant folding,
        // cast simplification, …) — `1 - l_discount` is `(1.0 - …)` with
        // the int literal folded by then. Running the declared SQL
        // through the same pipeline normalizes both sides identically.
        // (The mini-plan is a bare Project — no Aggregate — so this very
        // rule no-ops on it; no recursion.)
        val optimized = org.apache.spark.sql.GraftSqlBridge
          .ofRows(spark, rel).selectExpr(s"($sql) AS __mv_derived")
          .queryExecution.optimizedPlan
        optimized.expressions.collectFirst {
          case al: Alias if al.name == "__mv_derived" => n -> inline(al.child)
        }
      }.toOption.flatten
    })

  /** The declared derived-MEASURE expressions, keyed by their MV column
    * name (`sum_revenue`, `max_mrho`, …) — bound and matched exactly like
    * derived grouping columns. */
  private def measureSqls(dfn: MvDef): Seq[(String, String)] =
    dfn.aggs.collect {
      case m @ MvSumD(_, sql) => m.named -> sql
      case m @ MvMinD(_, sql) => m.named -> sql
      case m @ MvMaxD(_, sql) => m.named -> sql
    }

  /** Is the scan's CURRENT listing (already cached by the planner's own
    * FileIndex) exactly the fingerprint of the last maintenance run? */
  private def fresh(rel: HadoopFsRelation, sig: ListingDigest): Boolean =
    sigOf(rel.location.listFiles(Nil, Nil).flatMap(_.files)) == sig

  /** Flatten an INNER equi-join tree down to its leaf scans: recursing
    * through Filters, rebindable Projects, and Inner Joins, collect the
    * residual predicates, the project lists, the leaf
    * (LogicalRelation, HadoopFsRelation) pairs, and the individual join
    * conjuncts. None when any node is something else — the star matcher
    * only serves trees built purely of inner joins over file scans
    * (any join order/associativity: the flattened multiset is
    * shape-insensitive, which is what lets Catalyst reorder the query's
    * joins without breaking the match). */
  private def flattenJoins(p: LogicalPlan, conds: Seq[Expression],
      projects: Seq[Seq[NamedExpression]])
      : Option[(Seq[Expression], Seq[Seq[NamedExpression]],
        Seq[(LogicalRelation, HadoopFsRelation)], Seq[Expression])] =
    p match {
      case Filter(c, ch) => flattenJoins(ch, conds :+ c, projects)
      case Project(pl, ch) if pl.forall {
          case _: AttributeReference => true
          case al: Alias => rebindable(al.child)
          case _ => false
        } => flattenJoins(ch, conds, projects :+ pl)
      case j: Join if j.joinType == Inner =>
        for {
          (condsL, projL, leavesL, jcondsL) <- flattenJoins(j.left, Nil, Nil)
          (condsR, projR, leavesR, jcondsR) <- flattenJoins(j.right, Nil, Nil)
        } yield (conds ++ condsL ++ condsR, projects ++ projL ++ projR,
          leavesL ++ leavesR,
          jcondsL ++ jcondsR ++
            j.condition.toSeq.flatMap(splitConjuncts))
      case lr @ LogicalRelation(r: HadoopFsRelation, _, _, _, _)
          if r.location.rootPaths.length == 1 =>
        Some((conds, projects, Seq((lr, r)), Nil))
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** Is `c` the declared key equality `leftKey = dim.dimKey` (either
    * operand order): one side the dim leaf's own `dimKey` attribute, the
    * other a `leftKey` attribute owned by ANY other leaf of the flattened
    * join (the fact, or an earlier dim in a snowflake chain). */
  private def isKeyEquality(c: Expression, mj: MvJoin,
      dimIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      otherIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId])
      : Boolean = c match {
    case EqualTo(a: AttributeReference, b: AttributeReference) =>
      (a.name == mj.factKey && otherIds(a.exprId) &&
        b.name == mj.dimKey && dimIds(b.exprId)) ||
      (b.name == mj.factKey && otherIds(b.exprId) &&
        a.name == mj.dimKey && dimIds(a.exprId))
    case _ => false
  }

  /** One rewrite candidate: the conjoined residual predicates, the
    * collected project lists, the relation `derived` declarations resolve
    * against, the registration to serve from, and a DEFERRED freshness
    * check (file-listing compares run only after the cheap name gates
    * pass — the rule fires on every Aggregate in every optimizer
    * fixed-point iteration, so everything costly is gated or cached). */
  private final case class Candidate(conds: Seq[Expression],
      projects: Seq[Seq[NamedExpression]], resolveRel: LogicalPlan,
      reg: Registered, isFresh: () => Boolean)

  /** Star/snowflake candidates: `Aggregate → …(fact ⋈ dim₁ ⋈ … ⋈ dimₙ)`
    * where the flattened inner-join tree has exactly one leaf per
    * registered table, each declared dim leaf matched by canonical path,
    * and the join conjuncts are exactly the declared key equalities (one
    * per link, each between the dim's key and a key on any OTHER leaf —
    * so both join orders and any associativity match). Residual
    * predicates from everywhere in the tree pool for grouping-column
    * re-binding; freshness checks the fact and every dim. */
  private def starCandidates(child: LogicalPlan): Seq[Candidate] =
    for {
      (conds, projects, leaves, jconds) <- flattenJoins(child, Nil, Nil).toSeq
      if leaves.length >= 2
      (factLr, factRel) <- leaves
      reg <- lookup(factRel.location.rootPaths.head)
      js = reg.dfn.joins
      if js.nonEmpty && leaves.length == js.length + 1 &&
        jconds.length == js.length
      // Each declared dim matched to a DISTINCT leaf by canonical path.
      dimLeaves = js.map(mj => leaves.filter { case (_, r) =>
        r.location.rootPaths.head.toUri.toString ==
          MaterializedView.canon(spark, mj.dimPath)
      })
      if dimLeaves.forall(_.length == 1) &&
        dimLeaves.map(_.head._1).distinct.length == js.length &&
        !dimLeaves.exists(_.head._1 eq factLr)
      inline = inliner(projects)
      // Every declared key pair appears among the join conjuncts, and
      // (counts equal, pairs distinct) the conjuncts are EXACTLY the
      // declared equalities — an extra or different predicate would make
      // the query's join a different relation than the MV's source.
      matched = js.zip(dimLeaves.map(_.head)).map { case (mj, (dimLr, _)) =>
        val dimIds = dimLr.output.map(_.exprId).toSet
        val otherIds = leaves.collect {
          case (lr, _) if lr ne dimLr => lr.output.map(_.exprId)
        }.flatten.toSet
        jconds.indexWhere(c => isKeyEquality(inline(c), mj, dimIds, otherIds))
      }
      if !matched.contains(-1) && matched.distinct.length == js.length
    } yield {
      val resolveRel = dimLeaves.map(_.head._1).foldLeft(factLr: LogicalPlan) {
        (acc, dimLr) => Join(acc, dimLr, Inner, None, JoinHint.NONE)
      }
      Candidate(conds, projects, resolveRel, reg,
        () => fresh(factRel, reg.sig) &&
          reg.dimSigs.zip(dimLeaves.map(_.head._2)).forall {
            case (s, dimRel) => fresh(dimRel, s)
          })
    }

  private def rewrite(orig: Aggregate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    child match {
      case ex: Expand => return rewriteExpand(groupExprs, aggExprs, ex)
      case _ =>
    }
    val candidates: Seq[Candidate] = unwrap(child, Nil, Nil) match {
      case Some((conds, projects, lr, rel)) =>
        lookup(rel.location.rootPaths.head)
          .filter(_.dfn.joins.isEmpty)
          .map(r => Candidate(conds, projects, lr, r, () => fresh(rel, r.sig)))
      case None => starCandidates(child)
    }
    candidates.view
      .flatMap(c => rewriteOver(c, groupExprs, aggExprs))
      .headOption
  }

  /** Grouping-sets serving: `Aggregate(keys ∪ {gid}, aggs,
    * Expand(projections, output, …scan(fact)))` — the shape
    * ROLLUP / CUBE / GROUPING SETS analyze to. The Expand node is KEPT
    * (it is what materializes each grouping set, null-ing the keys a set
    * drops and tagging rows with the grouping id); only its INPUT changes
    * from fact rows to MV partial rows, and each aggregate call
    * re-derives over partials it now passes through. Sound because every
    * grouping set's keys must land on MV grouping columns, so each set is
    * a coarsening of the MV grain and re-aggregating partials per set
    * equals aggregating fact rows per set — the same algebra that already
    * serves coarser plain groupings. A measure passthrough referenced by
    * a grouping key, or a grouping copy referenced inside an aggregate
    * call (whose per-set nulls the partials cannot reproduce), bails. */
  private def rewriteExpand(groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], ex: Expand): Option[LogicalPlan] = {
    // The same two source shapes the plain path serves: a bare fact scan,
    // or the registered star join (ROLLUP over fact⋈dim — the rewritten
    // plan drops the join entirely; the MV rows already carry dim keys).
    val candidates: Seq[Candidate] = unwrap(ex.child, Nil, Nil) match {
      case Some((conds, projects, lr, rel)) =>
        lookup(rel.location.rootPaths.head)
          .filter(_.dfn.joins.isEmpty)
          .map(r => Candidate(conds, projects, lr, r, () => fresh(rel, r.sig)))
      case None => starCandidates(ex.child)
    }
    candidates.view
      .flatMap(c => expandOver(c, groupExprs, aggExprs, ex))
      .headOption
  }

  private def expandOver(cand: Candidate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], ex: Expand): Option[LogicalPlan] = {
    val inline = inliner(cand.projects)
    val groupRefIds = groupExprs.flatMap(_.references).map(_.exprId).toSet

    // Classify each Expand output column by shape + usage (pure, cheap).
    def isNullLit(e: Expression): Boolean = e match {
      case Literal(null, _) => true; case _ => false
    }
    val cols: Seq[Option[ExCol]] = ex.output.indices.map { i =>
      val entries = ex.projections.map(_(i))
      if (groupRefIds(ex.output(i).exprId)) {
        if (entries.forall(_.isInstanceOf[Literal]) && !entries.exists(isNullLit))
          Some(ExConst)
        else {
          val nonNull = entries.filterNot(isNullLit)
          if (nonNull.nonEmpty &&
              nonNull.forall(_.semanticEquals(nonNull.head)) &&
              !nonNull.head.isInstanceOf[Literal])
            Some(ExGroup(inline(nonNull.head)))
          else None
        }
      } else if (entries.forall(e => !e.isInstanceOf[Literal] &&
          e.semanticEquals(entries.head)))
        Some(ExPass(inline(entries.head)))
      else None
    }
    if (cols.exists(_.isEmpty)) return None
    val shape = cols.map(_.get)
    val passSrc: Map[Long, Expression] = ex.output.indices.flatMap { i =>
      shape(i) match {
        case ExPass(src) => Some(ex.output(i).exprId.id -> src)
        case _ => None
      }
    }.toMap
    val keptIdx = ex.output.indices.filterNot(shape(_).isInstanceOf[ExPass])
    val keptIds = keptIdx.map(ex.output(_).exprId).toSet
    def substSrc(fn: Expression): Expression = fn.transformUp {
      case a: AttributeReference if passSrc.contains(a.exprId.id) =>
        passSrc(a.exprId.id)
    }

    val dfn = cand.reg.dfn
    // Cheap gates: grouping sources plausible by name; every aggregate
    // call references only passthroughs and is name-derivable after
    // substituting them by their fact-side sources. Freshness last.
    val groupsPlausible = shape.forall {
      case ExGroup(a: AttributeReference) => dfn.groupCols.contains(a.name)
      case ExGroup(_) => dfn.derived.nonEmpty
      case _ => true
    }
    val aggsPlausible = aggExprs.forall { ne =>
      ne.collect {
        case ae: AggregateExpression =>
          !ae.isDistinct && ae.filter.isEmpty &&
            ae.aggregateFunction.references.forall(r =>
              passSrc.contains(r.exprId.id)) &&
            aggDerivableByName(substSrc(ae.aggregateFunction), dfn)
      }.forall(identity)
    }
    if (!groupsPlausible || !aggsPlausible || !cand.isFresh()) None
    else serveExpand(cand.reg, cand.conds.map(inline), cand.resolveRel, ex,
      shape, passSrc, keptIdx, keptIds, groupExprs, aggExprs, inline, substSrc)
  }

  /** The build step of [[rewriteExpand]], after all cheap gates passed. */
  private def serveExpand(reg: Registered, conds: Seq[Expression],
      lr: LogicalPlan, ex: Expand, shape: Seq[ExCol],
      passSrc: Map[Long, Expression], keptIdx: Seq[Int],
      keptIds: Set[org.apache.spark.sql.catalyst.expressions.ExprId],
      groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
      inline: Expression => Expression,
      substSrc: Expression => Expression): Option[LogicalPlan] = {
    val dfn = reg.dfn
    for {
      bound <- bindDerivedCached(lr, dfn, inline)
      groupNames = dfn.derived.map(_._1).toSet
      derived = bound.filter { case (n, _) => groupNames(n) }
      measures = bound.collect { case (n, e) if !groupNames(n) => n -> e }.toMap
      mvScan = MaterializedView.scanOf(spark, dfn.mvPath): LogicalPlan
      mvAttr = mvScan.output.collect {
        case a: AttributeReference => a.name -> a
      }.toMap
      groupTarget = (e: Expression) => e match {
        case a: AttributeReference if dfn.groupCols.contains(a.name) =>
          mvAttr.get(a.name)
        case e0 => derived.collectFirst {
          case (n, be) if semEq(be, e0) => n
        }.flatMap(mvAttr.get)
      }
      // Every grouping copy must land on an MV grouping column.
      groupAttrByIdx <- seqOpt(shape.map {
        case ExGroup(src) => groupTarget(src).map(Option(_))
        case _ => Some(None) // ExConst / ExPass: no mapping needed
      })
      // Residual predicates re-bind exactly as in the plain path.
      newConds <- seqOpt(conds.map { c =>
        if (!rebindable(c)) None
        else {
          val mvIds = mvAttr.values.map(_.exprId).toSet
          val swapped = c.transformDown {
            case e if groupTarget(e).isDefined => groupTarget(e).get
          }
          if (swapped.references.forall(a => mvIds.contains(a.exprId)))
            Some(swapped)
          else None
        }
      })
      // Aggregate outputs: grouping/gid attrs survive verbatim; aggregate
      // calls re-derive over partial columns after substituting
      // passthrough attrs by their fact-side sources.
      newAggs <- seqOpt(aggExprs.map { ne =>
        def go(x: Expression): Option[Expression] = x match {
          case ae @ AggregateExpression(fn, _, false, None, _)
              if fn.references.forall(r => passSrc.contains(r.exprId.id)) =>
            rederiveFn(substSrc(fn), dfn, mvAttr, measures)
              .map(r => if (r.dataType == ae.dataType) r else Cast(r, ae.dataType))
          case _: AggregateExpression => None
          case a: AttributeReference =>
            if (keptIds(a.exprId)) Some(a) else None
          case other if other.deterministic && !other.isInstanceOf[
              org.apache.spark.sql.catalyst.expressions.PlanExpression[_]] =>
            seqOpt(other.children.map(go)).map(other.withNewChildren)
          case _ => None
        }
        ne match {
          case a: AttributeReference if keptIds(a.exprId) => Some(a)
          case al @ Alias(e, n) => go(e).map(x => Alias(x, n)(exprId = al.exprId))
          case _ => None
        }
      })
    } yield {
      // Partial columns the rewritten aggregates read: pass them through
      // every grouping set unchanged (partials are never null-ed — only
      // grouping KEYS vary per set).
      val mvIds = mvScan.output.map(_.exprId).toSet
      val passMv = newAggs.flatMap(_.references).distinct
        .collect { case a: AttributeReference if mvIds(a.exprId) => a }
      val newOutput = keptIdx.map(ex.output) ++ passMv
      val newProjections = ex.projections.map { row =>
        keptIdx.map { i =>
          groupAttrByIdx(i) match {
            case Some(mvG) =>
              row(i) match { case l @ Literal(null, _) => l; case _ => mvG }
            case None => row(i) // constant-per-set (grouping id)
          }
        } ++ passMv
      }
      val filtered = newConds.reduceOption(And)
        .map(c => Filter(c, mvScan)).getOrElse(mvScan)
      Aggregate(groupExprs, newAggs,
        Expand(newProjections, newOutput, filtered))
    }
  }

  /** [[rewriteExpand]]'s column classification. */
  private sealed trait ExCol
  private case object ExConst extends ExCol
  private final case class ExGroup(src: Expression) extends ExCol
  private final case class ExPass(src: Expression) extends ExCol

  /** Name-level derivability of one aggregate CALL — the zero-cost twin
    * of `deriveNamed`'s rederive, used to bail before any analysis or MV
    * read. Must never reject a derivable shape (it gates the real check,
    * not replaces it). */
  private def aggDerivableByName(fn: Expression, dfn: MvDef): Boolean =
    fn match {
      case Sum(child, _) => sumSource(child).exists(src =>
        dfn.aggs.exists { case MvSum(c) => c == src; case _ => false }) ||
        // A derived-measure sum can't be checked by name — pass to the
        // semantic match whenever the spelling (exact-decimal cast) and a
        // declared MvSumD make one possible.
        (child match {
          case Cast(_, dt, _, _) if dt == MaterializedView.SumDec =>
            dfn.aggs.exists(_.isInstanceOf[MvSumD])
          case _ => false
        })
      case Min(a: AttributeReference) =>
        dfn.aggs.exists { case MvMin(c) => c == a.name; case _ => false } ||
          dfn.aggs.exists(_.isInstanceOf[MvMinD])
      case Min(_) => dfn.aggs.exists(_.isInstanceOf[MvMinD])
      case Max(a: AttributeReference) =>
        dfn.aggs.exists { case MvMax(c) => c == a.name; case _ => false } ||
          dfn.aggs.exists(_.isInstanceOf[MvMaxD])
      case Max(_) => dfn.aggs.exists(_.isInstanceOf[MvMaxD])
      case Count(Seq(Literal(v, _))) if v != null =>
        dfn.aggs.contains(MvCountStar)
      case Count(Seq(a: AttributeReference)) =>
        dfn.aggs.exists { case MvCount(c) => c == a.name; case _ => false }
      case Average(a: AttributeReference, _) =>
        dfn.aggs.exists { case MvSum(c) => c == a.name; case _ => false } &&
          dfn.aggs.exists { case MvCount(c) => c == a.name; case _ => false }
      case _ => false
    }

  // bindDerived is an ANALYSIS (ofRows + selectExpr) — cache per
  // (relation-instance, mvPath): attribute exprIds are stable across the
  // optimizer's repeated invocations within one query, and globally
  // unique per JVM, so the key never aliases across queries. Bounded by
  // periodic clear (entries are tiny).
  private val derivedCache =
    new ConcurrentHashMap[(Long, String), Option[Seq[(String, Expression)]]]()

  private def bindDerivedCached(rel: LogicalPlan, dfn: MvDef,
      inline: Expression => Expression): Option[Seq[(String, Expression)]] = {
    val pairs = dfn.derived ++ measureSqls(dfn)
    if (pairs.isEmpty) return Some(Nil)
    val key = (rel.output.head.exprId.id, dfn.mvPath)
    if (derivedCache.size > 4096) derivedCache.clear()
    derivedCache.computeIfAbsent(key, _ => bindDerived(rel, pairs, inline))
  }

  private def rewriteOver(cand: Candidate, groupExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression]): Option[LogicalPlan] = {
    val dfn = cand.reg.dfn
    val inline = inliner(cand.projects)
    // Cheap gate 1: every grouping key must be a declared stored
    // attribute, or (only when derived buckets exist) a non-attribute
    // expression that could still match one — by NAME, no analysis.
    val inlinedGroups = groupExprs.map(inline)
    val groupsPlausible = inlinedGroups.forall {
      case a: AttributeReference => dfn.groupCols.contains(a.name)
      case _ => dfn.derived.nonEmpty
    }
    if (!groupsPlausible) return None
    // Cheap gate 2: every aggregate CALL must be name-derivable from the
    // declared partials (DISTINCT/FILTER/unknown functions bail here).
    val aggsPlausible = aggExprs.forall { ne =>
      inline(ne).collect {
        case ae: AggregateExpression =>
          !ae.isDistinct && ae.filter.isEmpty &&
            aggDerivableByName(ae.aggregateFunction, dfn)
      }.forall(identity)
    }
    if (!aggsPlausible) return None
    // Only a plausibly-subsumed query pays the listing compare, the
    // (cached) derived-expression analysis, and the (cached) MV read.
    if (!cand.isFresh()) return None
    for {
      bound <- bindDerivedCached(cand.resolveRel, dfn, inline)
      groupNames = dfn.derived.map(_._1).toSet
      derived = bound.filter { case (n, _) => groupNames(n) }
      measures = bound.collect { case (n, e) if !groupNames(n) => n -> e }.toMap
      conds = cand.conds.map(inline)
      mvScan = MaterializedView.scanOf(spark, dfn.mvPath): LogicalPlan
      mvAttr = mvScan.output.collect {
        case a: AttributeReference => a.name -> a
      }.toMap
      // One query-side expression's MV grouping column, if any: a bare
      // stored grouping attribute, or anything semantically equal to a
      // declared derived expression.
      groupTarget = (e: Expression) => e match {
        case a: AttributeReference if dfn.groupCols.contains(a.name) =>
          mvAttr.get(a.name)
        case e0 => derived.collectFirst {
          case (n, be) if semEq(be, e0) => n
        }.flatMap(mvAttr.get)
      }
      // Subsumption: every grouping key lands on an MV grouping column.
      newGroup <- seqOpt(groupExprs.map(e => groupTarget(inline(e))))
      // Predicates re-bind if, after swapping derived-expression
      // occurrences for their MV columns, they reference only MV
      // grouping columns.
      newConds <- seqOpt(conds.map { c =>
        if (!rebindable(c)) None
        else {
          val mvIds = mvAttr.values.map(_.exprId).toSet
          val swapped = c.transformDown {
            case e if groupTarget(e).isDefined => groupTarget(e).get
          }
          if (swapped.references.forall(a => mvIds.contains(a.exprId)))
            Some(swapped)
          else None
        }
      })
      newAggs <- seqOpt(aggExprs.map(
        deriveNamed(_, dfn, mvAttr, groupTarget, measures, inline)))
    } yield {
      val filtered = newConds.reduceOption(And)
        .map(c => Filter(c, mvScan)).getOrElse(mvScan)
      Aggregate(newGroup, newAggs, filtered)
    }
  }

  private def seqOpt[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  /** Exact under re-association: integral and decimal sums re-add to the
    * same bits; a BARE float sum does not and is never rewritten. The
    * engine's own sum spelling ([[graft.api.Exact.dsum]]) casts to
    * decimal(30,6) first — that shape is exact for any source type and
    * is what the MV's partials store.
    *
    * Decimals must FIT the stored partial's decimal(30,6): scale > 6
    * would round at the partial's cast and integral digits > 24 could
    * overflow it to null (dropping rows from the partial) — either way
    * the rewritten bare sum(x) would differ from the direct plan, so
    * such sources are never rewritten (and [[MaterializedView]] refuses
    * the MvSum declaration at build time).
    *
    * Declared edge divergence for bare INTEGRAL sums: under non-ANSI
    * mode a direct sum(long) that exceeds 2^63 wraps, while the
    * rewritten exact-decimal re-aggregation casts back to long as null —
    * no silent wrong number, and under ANSI mode both plans raise. The
    * exact-decimal answer is retained deliberately (the dsum spelling
    * shares the decimal lattice on both plans and has no edge at all). */
  private def exactSum(a: AttributeReference): Boolean = a.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case d: DecimalType =>
      d.scale <= MaterializedView.SumDec.scale &&
        d.precision - d.scale <=
          MaterializedView.SumDec.precision - MaterializedView.SumDec.scale
    case _ => false
  }

  /** The declared fact column a rewriteable sum child reads, if its
    * accumulation is exact: either `cast(x as decimal(30,6))` (the
    * [[graft.api.Exact.dsum]] spelling — matches the stored partial's
    * own cast, so re-adding partials is value-identical for ANY source
    * type) or a bare integral/decimal attribute. */
  private def sumSource(child: Expression): Option[String] = child match {
    case Cast(a: AttributeReference, dt, _, _) if dt == MaterializedView.SumDec =>
      Some(a.name)
    case a: AttributeReference if exactSum(a) => Some(a.name)
    case _ => None
  }

  /** One output column of the original Aggregate, re-derived over the MV
    * with the ORIGINAL name, exprId, and data type (parents resolve
    * against all three). The column may be ANY expression over aggregate
    * calls and grouping attributes (`dsum(x).cast("double")`,
    * `dsum(x) / count(x)`, …): aggregate calls re-derive from the MV's
    * partials, grouping references re-bind to the MV's columns, and the
    * surrounding arithmetic is kept verbatim. */
  /** One aggregate CALL (already reduced to scan attributes) re-derived
    * over the MV's partial columns — the shared core of the plain/star
    * path ([[deriveNamed]]) and the grouping-sets path
    * ([[rewriteExpand]]). */
  private def rederiveFn(fn: Expression, dfn: MvDef,
      mvAttr: Map[String, AttributeReference],
      measures: Map[String, Expression]): Option[Expression] = {
    def derived(f: PartialFunction[MvAgg, MvAgg]): Option[AttributeReference] =
      dfn.aggs.collectFirst(f).flatMap(a => mvAttr.get(a.named))
    // The declared derived measure (of the given kinds) whose bound
    // expression is semantically the aggregate's argument, if any.
    def measureMatch(e: Expression)(kind: PartialFunction[MvAgg, MvAgg])
        : Option[AttributeReference] =
      dfn.aggs.collect(kind).collectFirst {
        case m if measures.get(m.named).exists(semEq(_, e)) => m
      }.flatMap(m => mvAttr.get(m.named))
    fn match {
      case Sum(child, _) =>
        sumSource(child).flatMap { src =>
          derived { case m @ MvSum(c) if c == src => m }
        }.orElse(child match {
          // Expression sums only in the exact-decimal spelling — the
          // partial stores sum(cast(e as decimal(30,6))), so the match
          // must see the same cast or re-addition could re-type.
          case Cast(e, dt, _, _) if dt == MaterializedView.SumDec =>
            measureMatch(e) { case m: MvSumD => m }
          case _ => None
        }).map(mv => Sum(mv).toAggregateExpression())
      case Min(a: AttributeReference) =>
        derived { case m @ MvMin(c) if c == a.name => m }
          .orElse(measureMatch(a) { case m: MvMinD => m })
          .map(mv => Min(mv).toAggregateExpression())
      case Min(e) =>
        measureMatch(e) { case m: MvMinD => m }
          .map(mv => Min(mv).toAggregateExpression())
      case Max(a: AttributeReference) =>
        derived { case m @ MvMax(c) if c == a.name => m }
          .orElse(measureMatch(a) { case m: MvMaxD => m })
          .map(mv => Max(mv).toAggregateExpression())
      case Max(e) =>
        measureMatch(e) { case m: MvMaxD => m }
          .map(mv => Max(mv).toAggregateExpression())
      case Count(Seq(Literal(v, _))) if v != null => // count(*) ≡ count(1)
        dfn.aggs.collectFirst { case MvCountStar => MvCountStar }
          .flatMap(a => mvAttr.get(a.named))
          .map(mv => Coalesce(Seq(Sum(mv).toAggregateExpression(), Literal(0L))))
      case Count(Seq(a: AttributeReference)) =>
        derived { case m @ MvCount(c) if c == a.name => m }
          .map(mv => Coalesce(Seq(Sum(mv).toAggregateExpression(), Literal(0L))))
      // Bare avg(x) over an exact-sum source, served from the MvSum +
      // MvCount pair. The final division is NOT re-implemented: the
      // re-derived sum and count are substituted into THIS Average
      // instance's own evaluateExpression (public buffer attributes), so
      // the result-type algebra — double division for integral sources,
      // the decimal precision/scale lattice for decimal ones — is
      // Spark's verbatim. Value-identity of the inputs: the exact-decimal
      // partial re-adds to the true sum, which equals the direct buffer's
      // accumulation for integral sources (double addition of integers is
      // exact below 2^53 — beyond it, the same documented edge as the
      // bare integral sum) and for fitting decimals (scale ≤ 6 means the
      // partial's cast is value-exact). The Coalesce mirrors the
      // buffer's never-null initialization so an empty/all-null group
      // divides 0/0 → null on both plans. A bare float avg re-associates
      // and is never rewritten, same as the bare float sum.
      case avgFn @ Average(a: AttributeReference, _) if exactSum(a) =>
        for {
          sumMv <- derived { case m @ MvSum(c) if c == a.name => m }
          cntMv <- derived { case m @ MvCount(c) if c == a.name => m }
        } yield {
          val sumAgg = Sum(sumMv).toAggregateExpression()
          val cntAgg = Sum(cntMv).toAggregateExpression()
          avgFn.evaluateExpression.transformUp {
            case at: AttributeReference if at.exprId == avgFn.sum.exprId =>
              Coalesce(Seq(Cast(sumAgg, at.dataType), Literal.default(at.dataType)))
            case at: AttributeReference if at.exprId == avgFn.count.exprId =>
              Coalesce(Seq(cntAgg, Literal(0L)))
          }
        }
      case _ => None
    }
  }

  private def deriveNamed(ne: NamedExpression, dfn: MvDef,
      mvAttr: Map[String, AttributeReference],
      groupTarget: Expression => Option[AttributeReference],
      measures: Map[String, Expression],
      inline: Expression => Expression)
      : Option[NamedExpression] = {
    def rederive(fn: Expression): Option[Expression] =
      rederiveFn(fn, dfn, mvAttr, measures)
    // Structural remap: aggregate calls and grouping expressions (stored
    // or derived) swap to their MV derivations; every other node must
    // reconstruct over successfully-remapped children or the whole
    // column (and with it the whole rewrite) bails.
    def remap(e: Expression): Option[Expression] = e match {
      case ae @ AggregateExpression(fn, _, false, None, _) =>
        rederive(fn).map { x =>
          if (x.dataType == ae.dataType) x else Cast(x, ae.dataType)
        }
      case _: AggregateExpression => None // DISTINCT / FILTER clause
      case e0 if groupTarget(e0).isDefined => groupTarget(e0)
      case _: AttributeReference => None // non-grouping stored column
      case other if other.deterministic &&
          !other.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]] =>
        seqOpt(other.children.map(remap)).map(other.withNewChildren)
      case _ => None
    }
    ne match {
      case a: AttributeReference =>
        groupTarget(inline(a)).map(mv => Alias(mv, a.name)(exprId = a.exprId))
      case al @ Alias(e, n) =>
        remap(inline(e)).map(x => Alias(x, n)(exprId = al.exprId))
      case _ => None
    }
  }
}
