package graft.plans

import graft.sources.SkippingIndex

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}

/** Automatic skipping-index consult — the optimizer half of
  * [[graft.sources.SkippingIndex]]: once a table is registered via
  * `SkippingIndex.enableAutoPrune`, ANY point-predicate scan over it is
  * rewritten to read only the index's candidate files, with no manual
  * `lookup` call at the query site (the Delta data-skipping /
  * `JoinElimination` injection precedent —
  * `SparkSessionExtensions.injectOptimizerRule` via GraftExtensions).
  *
  * Matched shape: `Filter(cond, scan)` where the scan is a single-root
  * v1 file relation whose canonical root is registered, and `cond`
  * contains an `key = literal` conjunct on the registered key column.
  * The rewrite swaps the relation's [[FileIndex]] for a wrapper that
  * keeps only the candidate files; the Filter STAYS on top, so a false
  * positive in the membership summary costs one extra file read and can
  * never change results (no false negatives by construction — the index
  * records every key fingerprint present in a file).
  *
  * The driver-side index is O(files) with a HARD ≤ 8 KB-per-file cap
  * (sparse fingerprint array below 2,048 entries, dense 65,536-bit
  * bitmap above — [[graft.sources.SkippingIndex.FileFps]]): worst case
  * ~8 GB at 1M files, typically far less, vs the planner's own file
  * listing at ~100 bytes/file (measured both regimes:
  * `tools/SkipIndexResidency` → SKIP_INDEX_RESIDENCY.json). It is
  * consulted once per optimization, not per row. Registration must be
  * refreshed after a table rewrite (new file names), like any skipping
  * index.
  */
case class ConsultSkippingIndex(spark: SparkSession) extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        l @ LogicalRelation(r: HadoopFsRelation, _, _, _, _))
        if !r.location.isInstanceOf[SkipPrunedFileIndex] =>
      val registered = r.location.rootPaths match {
        case Seq(p) => SkippingIndex.autoIndexOf(p)
        case _ => None
      }
      registered.fold(f: LogicalPlan) { ai =>
        val probes = conjuncts(cond).collect {
          case EqualTo(a: AttributeReference, Literal(v, dt))
              if a.name == ai.keyCol && v != null => (v, dt)
          case EqualTo(Literal(v, dt), a: AttributeReference)
              if a.name == ai.keyCol && v != null => (v, dt)
        }
        if (probes.isEmpty) f
        else {
          // A conjunction of point predicates on the key prunes to the
          // INTERSECTION of each literal's candidate files.
          val keep = probes
            .map { case (v, dt) => ai.candidateFiles(v, dt) }
            .reduce(_ intersect _)
          if (keep.size >= ai.nFiles) f
          else Filter(cond,
            l.copy(relation =
              r.copy(location = new SkipPrunedFileIndex(r.location, keep))(spark)))
        }
      }
  }
}

/** A [[FileIndex]] view keeping only the skipping index's candidate
  * files (canonical URI paths). Listing delegates to the underlying
  * index, so partition discovery, metadata columns, and refresh all
  * behave as the original scan's. */
class SkipPrunedFileIndex(underlying: FileIndex, keep: Set[String])
    extends FileIndex {

  private def canon(p: Path): String = p.toUri.getPath

  override def rootPaths: Seq[Path] = underlying.rootPaths

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => PartitionDirectory(pd.values,
        pd.files.filter(fm => keep.contains(canon(fm.getPath)))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(p => keep.contains(canon(new Path(p))))

  override def refresh(): Unit = underlying.refresh()

  // Kept-file bytes, so join-strategy estimates see the pruned size.
  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files.map(_.getLen)).sum

  override def partitionSchema: org.apache.spark.sql.types.StructType =
    underlying.partitionSchema
}
