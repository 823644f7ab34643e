package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** PK–FK join elimination — a Catalyst optimizer rule Spark itself cannot
  * apply because it has no constraint metadata: an inner equi-join against
  * a dimension whose columns (beyond the join key) nobody reads is a no-op
  * UNDER the declared constraints (the dimension key is unique, and every
  * fact-side foreign key is non-null and matches exactly one dimension
  * row), so the rule replaces it with the fact side, aliasing the foreign
  * key wherever the dimension key was referenced.
  *
  * At 100 TB this deletes an entire broadcast build (or worse, a shuffle)
  * per eliminated join — the win star-schema query generators leave on the
  * table when they mechanically join every dimension they MIGHT need.
  *
  * Safety: the rule fires only for declared FK→PK pairs
  * ([[JoinElimination.declaredFkPk]] — the role a catalog's RELY
  * constraints play in production engines). A declaration names BOTH the
  * table identity and the column: the key attributes must be produced by
  * leaf scans of those exact tables (identity = the scan location's base
  * name for file relations, the catalog name for v2 tables), so a
  * coincidentally named column on some other relation — where no
  * integrity holds — can never activate the rewrite. The declaration
  * asserts the FK is NON-NULL and matched (a null or dangling FK row
  * would be dropped by the inner join but kept by the rewrite); declare
  * pairs only for tables whose generator guarantees it, as the TPC-H
  * fixtures do. The dimension side must additionally be a bare scan:
  * Projects of plain attributes and the `IsNotNull(pk)` filter the
  * optimizer infers from the join condition are accepted, anything else
  * (a real filter, an aggregate) could drop dimension rows and void the
  * integrity declaration.
  *
  * Injected through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]), it runs inside the operator-
  * optimization fixed point, AFTER column pruning has already narrowed an
  * unreferenced dimension to its key — which is exactly the shape matched.
  * `JoinEliminationSpec` pins both the plan shape (no join) and result
  * equivalence against the un-eliminated query; `rel_join_eliminated`
  * differentially checks it against DuckDB, whose oracle RUNS the join.
  */
object JoinElimination {

  /** A column bound to its table identity (see [[EliminatePkFkJoin.tableOf]]
    * for how a leaf scan's identity is derived). */
  final case class ColRef(table: String, column: String)

  /** FK (table, column) → PK (table, column). Declaring a pair asserts:
    * the PK is unique in its table, and every FK value is NON-NULL with a
    * matching PK row — the TPC-H-style generator guarantees for these
    * fixtures. The table identity is part of the declaration so the rule
    * can never fire on a same-named column of an unrelated relation. */
  val declaredFkPk: Map[ColRef, ColRef] = Map(
    ColRef("customer", "c_nationkey") -> ColRef("nation", "n_nationkey"),
    ColRef("supplier", "s_nationkey") -> ColRef("nation", "n_nationkey"),
    ColRef("nation", "n_regionkey")   -> ColRef("region", "r_regionkey"),
    ColRef("orders", "o_custkey")     -> ColRef("customer", "c_custkey"),
    ColRef("lineitem", "l_orderkey")  -> ColRef("orders", "o_orderkey"),
    ColRef("lineitem", "l_suppkey")   -> ColRef("supplier", "s_suppkey"),
    ColRef("lineitem", "l_partkey")   -> ColRef("part", "p_partkey"))
}

case class EliminatePkFkJoin(spark: SparkSession) extends Rule[LogicalPlan] {

  import JoinElimination.declaredFkPk

  /** True iff the PK side is a bare dimension scan (see class doc). */
  private def pkOnlyScan(plan: LogicalPlan, pk: AttributeReference): Boolean =
    plan match {
      case Project(projList, child) =>
        projList.forall(_.isInstanceOf[AttributeReference]) &&
          pkOnlyScan(child, pk)
      case Filter(IsNotNull(a: AttributeReference), child) =>
        a.exprId == pk.exprId && pkOnlyScan(child, pk)
      case _: LeafNode => true
      case _ => false
    }

  /** The declared table identity of a leaf scan, or None for leaves the
    * rule should never trust: file relations identify as the scan
    * location's base name sans extension (`.../customer.parquet` →
    * "customer" — how [[graft.sources.Tables.load]] lays tables out), v2
    * relations as their catalog table name. Anything else — a local
    * collection, a view over derived work — has no identity and therefore
    * never matches a declaration. */
  private def tableOf(leaf: LogicalPlan): Option[String] = leaf match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map { p =>
            val n = p.getName
            val dot = n.lastIndexOf('.')
            if (dot > 0) n.substring(0, dot) else n
          }
        case _ => None
      }
    case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      Option(v2.table).map(_.name())
    case _ => None
  }

  /** The table identity of the LEAF relation producing `attr` in `plan`,
    * or None when the attribute is not a stored column (an Alias of
    * derived work — `expr.as("c_nationkey")` must never activate
    * elimination) or its leaf has no trustable identity. */
  private def baseTableOf(plan: LogicalPlan, attr: AttributeReference): Option[String] =
    plan.collectLeaves()
      .find(_.output.exists(_.exprId == attr.exprId))
      .flatMap(tableOf)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner,
        Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
      import JoinElimination.ColRef
      // The declaration decides which operand is the FK — not operand or
      // join order (customer ⋈ nation and nation ⋈ customer both count).
      // Both keys must resolve to stored columns of the DECLARED tables.
      val oriented = Seq((a, b), (b, a)).collectFirst {
        case (fk, pk) if
            (left.outputSet.contains(fk) ^ right.outputSet.contains(fk)) && {
              val (fkS, pkS) =
                if (left.outputSet.contains(fk)) (left, right) else (right, left)
              baseTableOf(fkS, fk).exists { fkTable =>
                declaredFkPk.get(ColRef(fkTable, fk.name)).exists { pkRef =>
                  pkRef.column == pk.name &&
                    baseTableOf(pkS, pk).contains(pkRef.table)
                }
              }
            } =>
          val (fkSide, pkSide) =
            if (left.outputSet.contains(fk)) (left, right) else (right, left)
          (fk, pk, fkSide, pkSide)
      }
      oriented match {
        case Some((fk, pk, fkSide, pkSide))
            if pkSide.outputSet.contains(pk) &&
              // (Key-to-declared-table binding already verified above.)
              // Column pruning must have reduced the dimension to its key —
              // any other surviving column means somebody reads it.
              pkSide.output.forall(_.exprId == pk.exprId) &&
              pkOnlyScan(pkSide, pk) =>
          // The join's output minus the dimension = the fact side; the
          // dimension key equals the foreign key on every surviving row, so
          // alias it (keeping the key's exprId, which upstream references
          // resolve against).
          val projected: Seq[NamedExpression] = j.output.map { attr =>
            if (attr.exprId == pk.exprId) Alias(fk, pk.name)(exprId = pk.exprId)
            else attr
          }
          Project(projected, fkSide)
        case _ => j
      }
  }
}
