package graft.sources

import java.util.concurrent.ConcurrentLinkedDeque

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-profile capture — Drill's sys.profiles / web-UI profile store
  * (reference: exec/.../server/rest/profile/ProfileResources.java and
  * store/sys ProfileInfoIterator), re-expressed over Spark's own
  * instrumentation hook: a QueryExecutionListener records one row per
  * completed action (success or failure) into a bounded in-memory ring,
  * queryable as a DataFrame that joins like any table.
  *
  * Bounded by design: `capacity` newest profiles are retained driver-side
  * (Drill bounds its profile store the same way); each row is a handful
  * of strings/longs, so the memory ceiling is KBs, independent of data
  * scale. Durable profile storage belongs on the CTAS path
  * (`profiles(spark).write.parquet(...)`).
  *
  * The ring is one-per-JVM (like Drill's per-bit profile store): sibling
  * sessions sharing the JVM see a combined profile stream; enable() is
  * per-session (it registers on that session's listener bus).
  */
object QueryProfiles {

  final case class Profile(ts_ms: Long, action: String, status: String,
                           duration_ms: Long, plan_head: String,
                           error: String)

  private val ring = new ConcurrentLinkedDeque[Profile]()
  @volatile private var registered: Option[QueryExecutionListener] = None
  private val DefaultCapacity = 1000

  /** Install the listener on the session (idempotent). */
  def enable(spark: SparkSession, capacity: Int = DefaultCapacity): Unit =
    synchronized {
      if (registered.isEmpty) {
        val l = new QueryExecutionListener {
          override def onSuccess(funcName: String, qe: QueryExecution,
                                 durationNs: Long): Unit =
            record(funcName, qe, durationNs, "success", "", capacity)
          override def onFailure(funcName: String, qe: QueryExecution,
                                 exception: Exception): Unit =
            record(funcName, qe, 0L, "failed",
              Option(exception.getMessage).getOrElse(
                exception.getClass.getSimpleName), capacity)
        }
        spark.listenerManager.register(l)
        registered = Some(l)
      }
    }

  def disable(spark: SparkSession): Unit = synchronized {
    registered.foreach(spark.listenerManager.unregister)
    registered = None
    ring.clear()
  }

  private def record(action: String, qe: QueryExecution, durationNs: Long,
                     status: String, error: String, capacity: Int): Unit = {
    val head = try {
      qe.analyzed.nodeName +
        qe.analyzed.children.headOption.map(c => " <- " + c.nodeName).getOrElse("")
    } catch { case _: Throwable => "(unanalyzed)" } // a failed query may
    // not have survived analysis; the profile row must still land
    ring.addFirst(Profile(System.currentTimeMillis(), action, status,
      durationNs / 1000000L, head, error))
    while (ring.size() > capacity) ring.pollLast()
  }

  /** sys.profiles: newest first. */
  def profiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ring.iterator().asScala.toSeq
      .toDF("ts_ms", "action", "status", "duration_ms", "plan_head", "error")
  }
}
