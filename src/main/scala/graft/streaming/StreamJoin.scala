package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the remaining core Structured Streaming operator
  * family next to windows/dedup/sessionization (the reference pipeline has
  * no second stream, so this enters as an engine-completeness surface, the
  * shape a real activity stream joining a slowly-arriving enrichment or
  * consent stream takes).
  *
  * Semantics/state contract (what makes this safe at scale):
  *   - BOTH sides carry a watermark and the join condition bounds lookup
  *     event time to a window relative to activity event time
  *     ([ts − tolerance, ts]) — that pair is what lets Spark expire
  *     buffered rows instead of holding both streams forever;
  *   - outer results (activity rows that never matched) are emitted only
  *     once the watermark proves no match can still arrive — asserted in
  *     StreamJoinSpec;
  *   - state is keyed by the equi-join key, so parallelism follows the
  *     shuffle partitioning like every other stateful operator here
  *     (RocksDB-backed state store configured in GraftSession).
  */
object StreamJoin {

  /** Interval join of `activity(key, ts, …)` to `lookups(key, ts, …)`:
    * rows pair when keys match and the lookup's event time falls within
    * `toleranceMinutes` BEFORE the activity's (inclusive on both ends).
    * `joinType` ∈ inner | leftOuter (the types core Spark supports for
    * stream-stream interval joins with a single-sided outer). Lookup
    * columns come back prefixed `l_`. */
  def intervalJoin(
      activity: DataFrame,
      lookups: DataFrame,
      joinType: String = "inner",
      watermark: String = "10 minutes",
      toleranceMinutes: Int = 5): DataFrame = {
    val a = activity.withWatermark("ts", watermark)
    val l = lookups.columns.foldLeft(lookups)((df, c) =>
      df.withColumnRenamed(c, s"l_$c"))
      .withWatermark("l_ts", watermark)
    a.join(l,
      expr(s"""key = l_key AND
               l_ts >= ts - INTERVAL $toleranceMinutes MINUTES AND
               l_ts <= ts"""),
      joinType)
  }
}
