package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/**
 * StreamingQueryListener bridge for the reference's operational metrics
 * (SURVEY §4 metrics row; reference exposes recordCount / batch-size
 * histogram-style gauges via Dropwizard,
 * sink/src/it/.../SimpleEndToEndSimulacronIT.java:635-683): per-query input
 * row totals, batch counts, and last observed rates, exposed as plain
 * volatile counters any reporter (JMX, logs) can poll.
 *
 * Attach with `spark.streams.addListener(listener)`.
 */
class GraftQueryListener extends StreamingQueryListener {

  case class QueryStats(
      inputRows: AtomicLong = new AtomicLong,
      batches: AtomicLong = new AtomicLong) {
    @volatile var lastInputRowsPerSec: Double = 0.0
    @volatile var lastProcessedRowsPerSec: Double = 0.0
  }

  val stats = TrieMap[String, QueryStats]()
  @volatile var activeQueries: Int = 0

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
    activeQueries += 1
    stats.putIfAbsent(e.name match { case null => e.id.toString; case n => n },
      QueryStats())
  }

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val key = p.name match { case null => p.id.toString; case n => n }
    val s = stats.getOrElseUpdate(key, QueryStats())
    s.inputRows.addAndGet(p.numInputRows)
    s.batches.incrementAndGet()
    s.lastInputRowsPerSec = p.inputRowsPerSecond
    s.lastProcessedRowsPerSec = p.processedRowsPerSecond
  }

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    activeQueries -= 1
}
