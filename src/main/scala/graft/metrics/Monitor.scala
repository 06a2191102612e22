package graft.metrics

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import scala.jdk.CollectionConverters._

/** I1/I2 — instrumentation and health.
  *
  * The reference publishes 10 named lifecycle events through dry-monitor
  * (lib/dionysus/monitor.rb:4-15) and exposes file-heartbeat health checks
  * (lib/dionysus/checks/health_check.rb:20-49). The Spark equivalents:
  * a [[StreamingQueryListener]] that turns query lifecycle + progress into
  * the same named events (subscribers: logs, statsd, a results topic), and
  * a health probe over `StreamingQuery.status`/`lastProgress` replacing the
  * heartbeat file.
  */
final class Monitor extends StreamingQueryListener {

  final case class Event(name: String, queryId: String, detail: String,
      atMs: Long = System.currentTimeMillis())

  private val events = new ConcurrentLinkedQueue[Event]()
  private val subscribers = new ConcurrentLinkedQueue[Event => Unit]()

  def subscribe(f: Event => Unit): Unit = subscribers.add(f)
  def drain(): List[Event] = events.asScala.toList

  private def emit(name: String, id: String, detail: String): Unit = {
    val e = Event(name, id, detail)
    events.add(e)
    subscribers.asScala.foreach(_(e))
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    emit("outbox_producer.started", e.id.toString, e.name)

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    emit("outbox_producer.processing_topic", e.progress.id.toString,
      s"batch=${e.progress.batchId} rows=${e.progress.numInputRows}")

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    emit(e.exception.map(_ => "outbox_producer.error")
      .getOrElse("outbox_producer.stopped"), e.id.toString,
      e.exception.getOrElse(""))
}

object Monitor {

  /** I2 — health: a query is healthy when it is active and its last
    * progress is fresher than `heartbeatTimeoutMs` (120 s outbox default,
    * reference: outbox/health_check.rb:8). A query that has produced no
    * progress yet is healthy if active (still starting). */
  def healthy(q: StreamingQuery, heartbeatTimeoutMs: Long = 120000L,
      nowMs: Long = System.currentTimeMillis()): Boolean =
    q.isActive && Option(q.lastProgress).forall { p =>
      val t = java.time.Instant.parse(p.timestamp).toEpochMilli
      nowMs - t <= heartbeatTimeoutMs
    }
}
