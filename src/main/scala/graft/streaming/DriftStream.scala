package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live CUSUM drift monitoring — the streaming form of the batch
  * `ts_cusum` operator (operators/TimeWindows.scala). A CUSUM needs a
  * REFERENCE mean; the batch query derives it from the full series, and
  * the operational form of that is exactly how control-chart monitoring
  * deploys: profile a reference window in batch, then track the live
  * stream's cumulative deviation against the frozen reference. `detect`
  * therefore takes the per-key reference means as input (from the batch
  * profile) and emits one row per COMPLETED hour with the running CUSUM
  * and the same 3×-mean drift flag.
  *
  * `flatMapGroupsWithState` keyed by event_type; state is O(1) per key —
  * the open hour's start + count and the running decimal CUSUM — so a
  * 100 TB/day stream's state store stays flat. Arithmetic mirrors the
  * batch operator bit-for-bit: each completed hour contributes
  * `DECIMAL(30,6)(count − mean)` to the running sum, exactly Spark's
  * `cast(c - m AS DECIMAL(30,6))` + decimal SUM, so `DriftStreamSpec`
  * asserts full parity with the oracle-checked batch rows. Per-key
  * event-time-ordered admission is the same contract [[AnomalyStream]]
  * enforces (violations fail loudly, never diverge silently).
  */
object DriftStream {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class DriftRow(
      event_type: String, bucket: java.sql.Timestamp, c: Long,
      cusum: Double, drift: Boolean)

  /** Open hour + running decimal cusum (unscaled string keeps the state
    * schema simple and exact) + consumed high-water mark. */
  final case class DriftState(
      hourStartMs: Long, count: Long, cusum: String, lastTs: Long, lastId: Long)

  private val HourMs = 3600L * 1000L

  /** DECIMAL(30,6) of a double, as Spark's cast computes it. */
  private def dec6(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  /** Emit completed-hour drift rows for a live event stream, against the
    * frozen per-key reference means. */
  def detect(events: Dataset[Event], refMeans: Map[String, Double]): Dataset[DriftRow] = {
    implicit val outEnc   = Encoders.product[DriftRow]
    implicit val stateEnc = Encoders.product[DriftState]
    implicit val keyEnc   = Encoders.STRING

    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DriftState, DriftRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (kind: String, rows: Iterator[Event], state: GroupState[DriftState]) =>
          val m = refMeans.getOrElse(kind,
            throw new IllegalArgumentException(s"no reference mean for '$kind'"))
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption
          val mark = prev.map(r => (r.lastTs, r.lastId)).getOrElse((Long.MinValue, Long.MinValue))
          sorted.headOption.foreach { e =>
            require(prev.isEmpty ||
                Ordering[(Long, Long)].gt((e.ts.getTime, e.event_id), mark),
              s"drift stream: out-of-order arrival for key '$kind' — event " +
                s"${e.event_id} @ ${e.ts} is not after the consumed high-water " +
                s"mark (ts=${mark._1} ms, id=${mark._2})")
          }
          var hourStart = prev.map(_.hourStartMs).getOrElse(Long.MinValue)
          var count = prev.map(_.count).getOrElse(0L)
          var cusum = prev.map(r => new JBigDecimal(r.cusum)).getOrElse(JBigDecimal.ZERO)
          val out = List.newBuilder[DriftRow]
          def closeHour(): Unit = if (hourStart != Long.MinValue) {
            cusum = cusum.add(dec6(count.toDouble - m))
            val cd = cusum.doubleValue
            out += DriftRow(kind, new java.sql.Timestamp(hourStart), count,
              cd, math.abs(cd) > 3.0 * m)
          }
          sorted.foreach { e =>
            val h = math.floorDiv(e.ts.getTime, HourMs) * HourMs
            if (h != hourStart) {
              closeHour()
              hourStart = h
              count = 0L
            }
            count += 1
          }
          val (newTs, newId) =
            sorted.lastOption.map(e => (e.ts.getTime, e.event_id)).getOrElse(mark)
          state.update(DriftState(hourStart, count, cusum.toPlainString, newTs, newId))
          out.result().iterator
      }
  }
}
