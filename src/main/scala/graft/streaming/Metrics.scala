package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability (SURVEY T3): per-query counters accumulated from
  * progress events — input rows, micro-batches, rows dropped as later than
  * the watermark, and current state-store size. This is how a pipeline
  * operator notices silent late-data loss or unbounded state growth without
  * scraping logs.
  */
object Metrics {

  /** Sentinel for `stateRows` when the store does not track row counts
    * (RocksDB with `trackTotalNumberOfRows=false` — the [[graft.GraftSession]]
    * default — reports numRowsTotal = -1 per operator). Kept as an explicit
    * "untracked" marker rather than summed: summing would report -N and a
    * consumer could misread a negative gauge as data. */
  val StateUntracked: Long = -1L

  final case class QueryMetrics(
      batches: Long,
      inputRows: Long,
      droppedByWatermark: Long,
      stateRows: Long)

  final class PipelineMetricsListener extends StreamingQueryListener {
    private val metrics = new ConcurrentHashMap[String, QueryMetrics]()

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()

    private val observed = new ConcurrentHashMap[String, java.lang.Long]()

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val name = Option(p.name).getOrElse(p.id.toString)
      val dropped = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      // Any operator reporting -1 means row tracking is off for the store
      // (the engine's RocksDB default): the whole gauge is untracked, not
      // a partial sum — see [[StateUntracked]].
      val rawState = p.stateOperators.map(_.numRowsTotal)
      val state = if (rawState.exists(_ < 0)) StateUntracked else rawState.sum
      metrics.merge(
        name,
        QueryMetrics(1L, p.numInputRows, dropped, state),
        (a, b) => QueryMetrics(
          a.batches + b.batches,
          a.inputRows + b.inputRows,
          a.droppedByWatermark + b.droppedByWatermark,
          b.stateRows)) // state size is a gauge: latest wins
      // Dataset.observe metrics (business-level metrics riding the plan —
      // e.g. Medallion's bronze gate), keyed "<observation>.<field>".
      // Integral fields are COUNTERS: summing per-batch counts across
      // batches is meaningful. Fractional fields (an avg/ratio observe
      // column) are GAUGES: truncating them to long and adding batches
      // together produces a meaningless number, so they are tracked
      // separately, latest value wins.
      p.observedMetrics.forEach { (obsName, row) =>
        row.schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) row.get(i) match {
            case n @ (_: java.lang.Long | _: java.lang.Integer |
                      _: java.lang.Short | _: java.lang.Byte) =>
              observed.merge(s"$obsName.${f.name}",
                java.lang.Long.valueOf(n.asInstanceOf[Number].longValue),
                (a: java.lang.Long, b: java.lang.Long) =>
                  java.lang.Long.valueOf(a + b))
            case n: Number =>
              observedGauges.put(s"$obsName.${f.name}",
                java.lang.Double.valueOf(n.doubleValue))
            case _ => ()
          }
        }
      }
      ()
    }

    private val observedGauges = new ConcurrentHashMap[String, java.lang.Double]()

    /** Accumulated Dataset.observe COUNTERS (integral fields only, summed
      * across batches), keyed "observation.field". */
    def observedSnapshot: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      observed.forEach((k, v) => b += (k -> v.longValue))
      b.result()
    }

    /** Latest value per fractional observe field (avg/ratio gauges — these
      * never sum across batches). */
    def observedGaugeSnapshot: Map[String, Double] = {
      val b = Map.newBuilder[String, Double]
      observedGauges.forEach((k, v) => b += (k -> v.doubleValue))
      b.result()
    }

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def snapshot: Map[String, QueryMetrics] = {
      val b = Map.newBuilder[String, QueryMetrics]
      metrics.forEach((k, v) => b += (k -> v))
      b.result()
    }
  }

  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): PipelineMetricsListener = {
    val l = new PipelineMetricsListener
    spark.streams.addListener(l)
    l
  }
}
