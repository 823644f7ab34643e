package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Live per-user lifetime watch-time totals on Spark 4's arbitrary-state
  * API (`transformWithState` + `StatefulProcessor`) — the modern stateful
  * form of the gold layer's running aggregate, complementing
  * [[Medallion.startGoldIncremental]]'s foreachBatch/parquet version:
  * here the running (sum, count) per user lives in the RocksDB state
  * store (GraftSession's default provider — transformWithState requires
  * it), each micro-batch emits the keys it touched with their updated
  * totals (Update mode), and state is O(|users|) regardless of history.
  *
  * Why ValueState and not a reduceGroups-style agg: the processor form
  * keeps per-key state addressable for the operational moves a 100 TB
  * pipeline eventually needs — TTL eviction of dormant keys (pass a real
  * [[TTLConfig]]), secondary state (e.g. a per-user regions MapState), or
  * event-time timers for scheduled flushes — none of which the SQL
  * aggregate surface exposes.
  *
  * Exactness: the fixture's watch times are integer-valued doubles
  * (generator emits 1..119), so the running double sum is exact and
  * batch-recompute parity is bit-for-bit ([[UserTotalsSpec]]); real
  * fractional inputs would switch the state to a scaled-long/decimal
  * representation, the [[AnomalyStream]] discipline.
  */
object UserTotals {

  final case class Activity(user_id: String, watch_time: Double)
  final case class Total(user_id: String, total_watch_time: Double, n_events: Long)

  /** Running (sum, n) per user; updates arrive via handleInputRows. */
  class TotalsProcessor extends StatefulProcessor[String, Activity, Total] {
    @transient private var sum: ValueState[Double] = _
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sum = getHandle.getValueState[Double](
        "sum", Encoders.scalaDouble, TTLConfig.NONE)
      cnt = getHandle.getValueState[Long](
        "cnt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[Activity],
        timerValues: TimerValues): Iterator[Total] = {
      var s = if (sum.exists()) sum.get() else 0.0
      var n = if (cnt.exists()) cnt.get() else 0L
      rows.foreach { a => s += a.watch_time; n += 1 }
      sum.update(s)
      cnt.update(n)
      Iterator.single(Total(key, s, n))
    }
  }

  /** Updated totals for every user a micro-batch touches (Update mode). */
  def totals(ds: Dataset[Activity]): Dataset[Total] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val outEnc: Encoder[Total] = Encoders.product[Total]
    ds.groupByKey(_.user_id)
      .transformWithState(
        new TotalsProcessor, TimeMode.None(), OutputMode.Update(), outEnc)
  }
}
