package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** D9 (async_d Monitor/PipelineAnalyser): per-action throughput telemetry
  * as a `QueryExecutionListener` — every completed action records its
  * duration and output rows; `report` is the Monitor's periodic dump,
  * pull-based instead of a polling greenlet.
  */
final class GraftQueryListener extends QueryExecutionListener {
  import GraftQueryListener.ActionStat

  private val stats = new ConcurrentLinkedQueue[ActionStat]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit = {
    val rows = try {
      qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
    } catch { case _: Exception => -1L }
    stats.add(ActionStat(funcName, durationNs, rows))
  }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    stats.add(ActionStat(s"$funcName!failed", 0L, -1L))

  def snapshot: Seq[ActionStat] = stats.asScala.toSeq

  def report: String = {
    val s = snapshot
    val byAction = s.groupBy(_.action).map { case (a, xs) =>
      f"$a%-12s n=${xs.size}%-4d total=${xs.map(_.durationNs).sum / 1e9}%.2fs"
    }
    s"actions=${s.size}\n" + byAction.mkString("\n")
  }
}

object GraftQueryListener {
  final case class ActionStat(action: String, durationNs: Long, outputRows: Long)

  /** Install a listener on the session and return it. */
  def install(spark: SparkSession): GraftQueryListener = {
    val l = new GraftQueryListener
    spark.listenerManager.register(l)
    l
  }
}
