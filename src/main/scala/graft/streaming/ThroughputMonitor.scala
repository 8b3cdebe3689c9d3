package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** One observed microbatch of a monitored streaming query. */
final case class BatchStats(batchId: Long, numInputRows: Long,
                            inputRowsPerSecond: Double,
                            processedRowsPerSecond: Double,
                            stateRows: Long)

/** Throughput/state probe — the Spark-native replacement for the
  * reference's custom `StreamMonitor` pass-through operator
  * (reference: src/test/scala/flink_perf/StreamMonitor.scala:9-44,
  * wired at JoinSpec.scala:164-171). Structured Streaming already
  * exposes rates, watermark, and state-store size per batch through
  * `StreamingQueryListener`, so no custom operator is needed
  * (SURVEY.md §2.7/§3.3).
  *
  * Attach with `spark.streams.addListener(monitor)`; read
  * [[snapshot]] after the run.
  */
final class ThroughputMonitor extends StreamingQueryListener {
  private val batches = ArrayBuffer.empty[BatchStats]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit =
    synchronized {
      val p = event.progress
      val stateRows =
        if (p.stateOperators.isEmpty) 0L
        else p.stateOperators.map(_.numRowsTotal).sum
      batches += BatchStats(p.batchId, p.numInputRows,
        p.inputRowsPerSecond, p.processedRowsPerSecond, stateRows)
    }

  def snapshot: Seq[BatchStats] = synchronized(batches.toSeq)

  def totalInputRows: Long = snapshot.map(_.numInputRows).sum
}
