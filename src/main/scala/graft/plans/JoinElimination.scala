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
  * constraints play in production engines), and only when the dimension
  * side is a bare scan: Projects of plain attributes and the
  * `IsNotNull(pk)` filter the optimizer infers from the join condition
  * are accepted, anything else (a real filter, an aggregate) could drop
  * dimension rows and void the integrity declaration.
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

  /** FK column → PK column. Declaring a pair asserts: the PK is unique in
    * its table and every (non-null) FK value has a matching PK row — the
    * TPC-H-style generator guarantees for these fixtures. */
  val declaredFkPk: Map[String, String] = Map(
    "c_nationkey" -> "n_nationkey",
    "s_nationkey" -> "n_nationkey",
    "n_regionkey" -> "r_regionkey",
    "o_custkey"   -> "c_custkey",
    "l_orderkey"  -> "o_orderkey",
    "l_suppkey"   -> "s_suppkey",
    "l_partkey"   -> "p_partkey")
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

  /** True iff `attr` is produced by a LEAF relation in `plan` — i.e. it is
    * a real stored column, not an Alias of derived work. Matching the
    * declaration by NAME alone would let `expr.as("c_nationkey")` activate
    * elimination on values with no integrity guarantee. */
  private def isBaseColumn(plan: LogicalPlan, attr: AttributeReference): Boolean =
    plan.collectLeaves().exists(_.output.exists(_.exprId == attr.exprId))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner,
        Some(EqualTo(a: AttributeReference, b: AttributeReference)), _) =>
      // The declaration decides which operand is the FK — not operand or
      // join order (customer ⋈ nation and nation ⋈ customer both count).
      val oriented = Seq((a, b), (b, a)).collectFirst {
        case (fk, pk) if declaredFkPk.get(fk.name).contains(pk.name) &&
            (left.outputSet.contains(fk) ^ right.outputSet.contains(fk)) =>
          val (fkSide, pkSide) =
            if (left.outputSet.contains(fk)) (left, right) else (right, left)
          (fk, pk, fkSide, pkSide)
      }
      oriented match {
        case Some((fk, pk, fkSide, pkSide))
            if pkSide.outputSet.contains(pk) &&
              // Both keys must be genuine stored columns of their scans.
              isBaseColumn(fkSide, fk) && isBaseColumn(pkSide, pk) &&
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
