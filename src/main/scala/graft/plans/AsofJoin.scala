package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the whole-operator Catalyst extension (SURVEY §2.3:
  * the join family Spark lacks; reference has no joins at all, this is the
  * north-star time-series surface beside `ts_asof_last_purchase`'s window
  * spelling and `ts_pit_join`).
  *
  * For every left ("probe") row, attach the single right ("state") row with
  * the same key and the greatest right-time ≤ the probe's time, or nulls if
  * none — pandas `merge_asof` / DuckDB `ASOF LEFT JOIN` semantics, which is
  * also exactly what the DuckDB oracle runs.
  *
  * Why a custom physical operator (ladder step (c): LogicalPlan +
  * SparkStrategy + SparkPlan, injected by [[graft.functions.GraftExtensions]]):
  * built-in spellings either theta-join on a time inequality (quadratic per
  * key) or union both streams through one window (linear, but it carries
  * every probe column through the sort and can't prune state columns until
  * after the window). The dedicated exec declares
  * `requiredChildDistribution` = clustered on the keys and
  * `requiredChildOrdering` = (key, time) on both sides, so EnsureRequirements
  * co-partitions and sorts the children — the sort-merge-join skeleton —
  * and then ONE forward merge pass per partition emits every probe with its
  * prevailing state: O(left + right) per partition, state = one buffered
  * right row per live key, no per-key buffering, no re-scan. At 100 TB both
  * sides shuffle once on the key (the minimum any co-located algorithm
  * pays) and nothing else is materialized.
  *
  * Semantics notes: right-time ties are broken by whichever sorts last
  * (callers wanting determinism make (key, time) unique on the state side,
  * as the fixture queries do); null keys compare like values (null-safe
  * equality), matching the window spelling's partition-by behavior.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: maps the logical as-of node to its exec. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Both sides clustered on their keys — EnsureRequirements inserts
    * co-partitioned exchanges (and AQE keeps them compatible, as for any
    * binary node that declares these requirements). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (key, time) ascending on both sides — the merge pass's precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  /** Probe rows pass through in order: partitioning and ordering are the
    * left child's — downstream keyed aggregations reuse the exchange. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(output, output)
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // Lookahead right row: the reference stays valid until the next
        // rIter.next() call, so holding it across left rows is safe; its
        // key is copied because the key projection's buffer is reused.
        private var rHead: InternalRow = _
        private var rHeadKey: InternalRow = _
        // Prevailing state for the current key group (copied: child rows
        // are buffer-backed and mutate on iterator advance).
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next()
            rHeadKey = rKeyProj(rHead).copy()
          } else {
            rHead = null
            rHeadKey = null
          }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
            lastMatch = null
            lastMatchKey = null
          }
          var scanning = true
          while (scanning && rHead != null) {
            val c = keyOrd.compare(rHeadKey, lKey)
            if (c < 0) advanceRight()
            else if (c == 0 && timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
              lastMatch = rHead.copy()
              lastMatchKey = rHeadKey
              advanceRight()
            } else scanning = false
          }
          numOutputRows += 1
          resultProj(joined(lRow,
            if (lastMatch != null) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Library API: `AsofJoin.left(probes, states, keys, probeTime, stateTime)`.
  * Column names must be unambiguous across the two sides (rename before
  * joining, as with any join producing both sides' columns). */
object AsofJoin {
  def left(
      probes: DataFrame,
      states: DataFrame,
      keys: Seq[(String, String)],
      probeTimeCol: String,
      stateTimeCol: String): DataFrame = {
    val session = probes.sparkSession
    // Library-user path for sessions built without GraftExtensions: the
    // runtime strategy hook (same role GraftFunctions.register plays for
    // expressions). Idempotent; harmless beside the injected strategy.
    if (!session.experimental.extraStrategies.contains(AsofJoinStrategy))
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = probes.queryExecution.analyzed
    val rp = states.queryExecution.analyzed
    // Self-join guard: shared expression IDs across the two children would
    // make the output projection bind both sides to the same input slots
    // (the analyzer dedupes built-in Join children, not custom nodes).
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"asof sides share attributes ${shared.toSeq.map(_.name).mkString(", ")} — " +
        "derive the state side independently or realias it (e.g. select with new names)")
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$n'"))
    val node = AsofJoinPlan(lp, rp,
      keys.map(k => attr(lp, k._1, "probe")),
      keys.map(k => attr(rp, k._2, "state")),
      attr(lp, probeTimeCol, "probe"),
      attr(rp, stateTimeCol, "state"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(session, node)
  }
}
