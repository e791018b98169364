package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import java.util.UUID
import scala.collection.concurrent.TrieMap

/** The D9 monitor/analyser as a streaming surface (the batch twin is
  * `plans.GraftQueryListener`): a [[StreamingQueryListener]] aggregating
  * per-query progress — micro-batches, input rows, cumulative state rows,
  * last batch duration — queryable from the driver while queries run.
  *
  * At scale this is the ops dashboard feed: listener callbacks are
  * driver-side and O(1) per micro-batch regardless of cluster size, so the
  * monitor itself never becomes a bottleneck (the reference's analyser
  * polls worker queues; Spark pushes the same numbers to the driver for
  * free). */
final class StreamMetricsListener extends StreamingQueryListener {

  final case class QuerySnapshot(
      name: String,
      batches: Long,
      inputRows: Long,
      stateRows: Long,
      lastBatchMillis: Long,
      terminated: Boolean,
      exception: Option[String])

  private val byQuery = TrieMap.empty[UUID, QuerySnapshot]

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    byQuery.put(e.id,
      QuerySnapshot(Option(e.name).getOrElse(e.id.toString),
        0L, 0L, 0L, 0L, terminated = false, None))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    byQuery.updateWith(p.id) {
      case Some(s) => Some(s.copy(
        batches = s.batches + 1,
        inputRows = s.inputRows + p.numInputRows,
        stateRows = stateRows,
        lastBatchMillis = Option(p.batchDuration).getOrElse(0L)))
      case None => Some(QuerySnapshot(
        Option(p.name).getOrElse(p.id.toString),
        1L, p.numInputRows, stateRows,
        Option(p.batchDuration).getOrElse(0L), terminated = false, None))
    }
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    byQuery.updateWith(e.id) {
      case Some(s) => Some(s.copy(terminated = true, exception = e.exception))
      case None    => Some(QuerySnapshot(e.id.toString, 0L, 0L, 0L, 0L,
        terminated = true, e.exception))
    }

  def snapshot(id: UUID): Option[QuerySnapshot] = byQuery.get(id)
  def snapshots: Map[UUID, QuerySnapshot] = byQuery.toMap
}

object StreamMetrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): StreamMetricsListener = {
    val l = new StreamMetricsListener
    spark.streams.addListener(l)
    l
  }
}
