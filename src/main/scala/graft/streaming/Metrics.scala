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
      val state = p.stateOperators.map(_.numRowsTotal).sum
      metrics.merge(
        name,
        QueryMetrics(1L, p.numInputRows, dropped, state),
        (a, b) => QueryMetrics(
          a.batches + b.batches,
          a.inputRows + b.inputRows,
          a.droppedByWatermark + b.droppedByWatermark,
          b.stateRows)) // state size is a gauge: latest wins
      // Dataset.observe metrics (business-level counters riding the plan —
      // e.g. Medallion's bronze gate): sum numeric fields per batch under
      // "<observation>.<field>".
      p.observedMetrics.forEach { (obsName, row) =>
        row.schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!row.isNullAt(i)) row.get(i) match {
            case n: Number =>
              observed.merge(s"$obsName.${f.name}",
                java.lang.Long.valueOf(n.longValue),
                (a: java.lang.Long, b: java.lang.Long) =>
                  java.lang.Long.valueOf(a + b))
            case _ => ()
          }
        }
      }
      ()
    }

    /** Accumulated Dataset.observe counters, keyed "observation.field". */
    def observedSnapshot: Map[String, Long] = {
      val b = Map.newBuilder[String, Long]
      observed.forEach((k, v) => b += (k -> v.longValue))
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
