package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.graft.ListenerBridge

/** R15 metrics (SURVEY §2.1). The reference stubs its store metrics to
  * null (TikvMetrics.java:33-36), so this is parity-plus: a
  * QueryExecutionListener that records, per completed action, the
  * action name, wall duration, rows produced by the query, and the
  * rows/bytes its file scans touched — the numbers an operator wants
  * when a 100 TB job misbehaves (did the filter push down? how much
  * did we actually read?).
  *
  * Listener events ride Spark's async bus; [[flush]] drains it so a
  * caller reading metrics right after an action sees that action.
  */
object QueryMetrics {

  final case class Rec(action: String, durationNs: Long,
                       outputRows: Option[Long], scanRows: Long,
                       scanBytes: Long, failed: Boolean)

  /** Topmost plan node carrying a numOutputRows metric = the row count
    * the query delivered (works for both reads and V2 writes; plain
    * breadth-first so a codegen wrapper above it doesn't hide it).
    */
  private def topOutputRows(plan: SparkPlan): Option[Long] = {
    val q = scala.collection.mutable.Queue(plan)
    while (q.nonEmpty) {
      val n = q.dequeue()
      n.metrics.get("numOutputRows") match {
        case Some(m) => return Some(m.value)
        case None => q.enqueueAll(n.children)
      }
    }
    None
  }

  final class Recorder extends QueryExecutionListener {
    private val buf = new ConcurrentLinkedQueue[Rec]()

    private def scanTotals(qe: QueryExecution): (Long, Long) =
      qe.executedPlan.collectLeaves().foldLeft((0L, 0L)) { case ((r, b), leaf) =>
        (r + leaf.metrics.get("numOutputRows").map(_.value).getOrElse(0L),
          b + leaf.metrics.get("filesSize").map(_.value).getOrElse(0L))
      }

    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit = {
      val (sr, sb) = scanTotals(qe)
      buf.add(Rec(funcName, durationNs, topOutputRows(qe.executedPlan), sr, sb,
        failed = false))
    }

    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit =
      buf.add(Rec(funcName, 0L, None, 0L, 0L, failed = true))

    def records: Seq[Rec] = buf.iterator().asScala.toSeq
    def clear(): Unit = buf.clear()
  }

  /** Drain the listener bus so `records` reflects every action already
    * completed on the calling thread.
    */
  def flush(spark: SparkSession): Unit = ListenerBridge.flushListenerBus(spark)

  /** Run `action` with a freshly-registered recorder and return its
    * records (listener unregistered on exit).
    */
  def capture(spark: SparkSession)(action: => Unit): Seq[Rec] = {
    val rec = new Recorder
    spark.listenerManager.register(rec)
    try { action; flush(spark); rec.records }
    finally spark.listenerManager.unregister(rec)
  }
}
