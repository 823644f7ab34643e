package graft.streaming

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live rolling z-score anomaly detection — the streaming form of the
  * batch `ts_anomaly` operator (operators/TimeWindows.scala), sharing its
  * exact semantics: each event is scored against the mean/stddev of the
  * preceding `window` events of its type, flagged when |z| > 3 with at
  * least `minN` history rows.
  *
  * `flatMapGroupsWithState` keyed by event_type; state is the trailing
  * ring of ≤ `window` values — O(window) per key, independent of stream
  * length, so state never grows (the property that keeps a 100 TB/day
  * stream's state store flat). Arithmetic matches the batch operator's
  * decimal discipline bit-for-bit: values are rounded into DECIMAL(30,6)
  * before summation (exactly Spark's `cast(value AS DECIMAL(30,6))` +
  * decimal SUM), so `AnomalyStreamSpec` can assert full parity — same
  * flagged events, same z-scores — between the live stream and the
  * oracle-checked batch query.
  */
object AnomalyStream {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)

  final case class Flagged(event_id: Long, event_type: String, value: Double, z: Double)

  /** Trailing values, oldest first, capped at the window length; plus the
    * high-water mark of (ts millis, event_id) already consumed for the key,
    * so a cross-batch ordering violation is DETECTED rather than silently
    * corrupting the trailing window (the contract is that events per key
    * arrive in event-time order across micro-batches — the landing layout's
    * name-ordered admission provides it; this enforces it). */
  final case class Ring(values: List[Double], lastTs: Long, lastId: Long)

  val Window = 100
  val MinN   = 30

  /** DECIMAL(30,6) of a double, as Spark's cast computes it (Spark's
    * Decimal goes through the double's SHORTEST decimal repr — valueOf —
    * not the exact binary expansion). */
  private def dec6(v: Double): JBigDecimal =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)

  /** Score one value against its trailing ring; Some(z) when flagged. */
  def score(buf: List[Double], value: Double): Option[Double] = {
    val cnt = buf.size
    if (cnt < MinN) None
    else {
      val sm = buf.foldLeft(JBigDecimal.ZERO)((a, v) => a.add(dec6(v))).doubleValue
      val sq = buf.foldLeft(JBigDecimal.ZERO)((a, v) => a.add(dec6(v * v))).doubleValue
      val mean = sm / cnt
      val variance = (sq - sm * sm / cnt) / (cnt - 1)
      if (variance <= 0) None
      else {
        val z = (value - mean) / math.sqrt(variance)
        if (math.abs(z) > 3) Some(z) else None
      }
    }
  }

  /** Detect anomalies on a (possibly streaming) typed event Dataset. */
  def detect(events: Dataset[Event]): Dataset[Flagged] = {
    implicit val outEnc   = Encoders.product[Flagged]
    implicit val stateEnc = Encoders.product[Ring]
    implicit val keyEnc   = Encoders.STRING

    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[Ring, Flagged](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (kind: String, rows: Iterator[Event], state: GroupState[Ring]) =>
          // Event-time order within the batch; cross-batch order is the
          // caller's admission order (the file source lists by name = by
          // event time in the landing layout). A batch delivering an event
          // at or before the key's consumed high-water mark would score
          // against the wrong trailing window AND corrupt the ring for
          // every later event — fail loudly (the ByteCappedFileSource
          // discipline), never diverge silently from the batch semantics.
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val prev = state.getOption
          var buf = prev.map(_.values).getOrElse(Nil)
          val mark = prev.map(r => (r.lastTs, r.lastId)).getOrElse((Long.MinValue, Long.MinValue))
          sorted.headOption.foreach { e =>
            require(prev.isEmpty ||
                Ordering[(Long, Long)].gt((e.ts.getTime, e.event_id), mark),
              s"anomaly stream: out-of-order arrival for key '$kind' — " +
                s"event ${e.event_id} @ ${e.ts} is not after the consumed " +
                s"high-water mark (ts=${mark._1} ms, id=${mark._2}); " +
                "upstream admission violated the per-key event-time order contract")
          }
          val out = List.newBuilder[Flagged]
          sorted.foreach { e =>
            score(buf, e.value).foreach { z =>
              out += Flagged(e.event_id, kind, e.value, z)
            }
            buf = (buf :+ e.value).takeRight(Window)
          }
          val (newTs, newId) =
            sorted.lastOption.map(e => (e.ts.getTime, e.event_id)).getOrElse(mark)
          state.update(Ring(buf, newTs, newId))
          out.result().iterator
      }
  }
}
