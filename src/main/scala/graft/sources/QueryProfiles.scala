package graft.sources

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedDeque}

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.{SparkListenerDriverAccumUpdates, SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionEnd, SparkListenerSQLExecutionStart}

/** Query-profile capture — Drill's sys.profiles / web-UI profile store
  * (reference: exec/.../server/rest/profile/ProfileResources.java and
  * store/sys ProfileInfoIterator), re-expressed over Spark's own
  * instrumentation hooks: one SparkListener records a profile row per
  * SQL execution (from the SQLExecutionStart/End event pair — the same
  * executionId Spark stamps on every job the query runs) and a stage
  * row per completed stage with the operator-level numbers Drill's
  * profiles carry (rows/bytes in, shuffle read/write, task time). The
  * shared executionId is the join key, the way Drill's per-operator
  * profile fragments hang off a query profile.
  *
  * Bounded by design: `capacity` newest profiles (and 4× that many
  * stage rows) are retained driver-side (Drill bounds its profile store
  * the same way); each row is a handful of strings/longs, so the memory
  * ceiling is KBs, independent of data scale. Durable profile storage
  * belongs on the CTAS path (`profiles(spark).write.parquet(...)`).
  *
  * The rings are one-per-JVM (like Drill's per-bit profile store):
  * sibling sessions sharing the JVM see a combined profile stream;
  * enable() is per-session (it registers on that session's context).
  */
object QueryProfiles {

  final case class Profile(ts_ms: Long, execution_id: Long, action: String,
                           status: String, duration_ms: Long,
                           plan_head: String, error: String, user: String)

  /** One completed stage, with the task-metric aggregates Spark already
    * accumulated — no extra instrumentation cost. execution_id ties the
    * stage to its query profile row (-1 = non-SQL job). */
  final case class StageProfile(execution_id: Long, stage_id: Int,
                                attempt: Int, name: String, num_tasks: Int,
                                duration_ms: Long, executor_run_ms: Long,
                                input_records: Long, input_bytes: Long,
                                output_records: Long, output_bytes: Long,
                                shuffle_read_records: Long,
                                shuffle_read_bytes: Long,
                                shuffle_write_records: Long,
                                shuffle_write_bytes: Long)

  /** One operator-level metric of a finished execution — the depth of
    * Drill's per-operator profile fragments (rows emitted, build/sort
    * times, spill bytes…). `value` is the sum of task + driver
    * accumulator UPDATES for that metric, which equals the final value
    * for the sum-shaped metric types (sum/size/timing/nsTiming — the
    * ones emitted; min/max/average shapes are skipped, a sum would
    * misrepresent them). */
  final case class OperatorProfile(execution_id: Long, node_id: Long,
                                   node: String, metric: String,
                                   metric_type: String, value: Long)

  private final case class Started(timeMs: Long, action: String,
                                   planHead: String, user: String)

  /** What one SQL-metric accumulator means: (node id, node name,
    * metric name, metric type). */
  private final case class MetricKey(nodeId: Long, node: String,
                                     metric: String, metricType: String)

  private val ring = new ConcurrentLinkedDeque[Profile]()
  private val stageRing = new ConcurrentLinkedDeque[StageProfile]()
  private val opRing = new ConcurrentLinkedDeque[OperatorProfile]()
  private val stageToExec = new ConcurrentHashMap[Integer, java.lang.Long]()
  private val jobStages = new ConcurrentHashMap[Integer, Seq[Int]]()
  private val inFlight = new ConcurrentHashMap[java.lang.Long, Started]()
  // principal channels (AccessControl): REST/runAs queries stamp a job
  // TAG read at SQLExecutionStart; JDBC (HiveServer2) operations post a
  // thrift OperationStart event carrying (groupId, user), which
  // onJobStart joins to the execution id via spark.jobGroup.id
  // Both are BOUNDED insertion-order maps (not ConcurrentHashMap +
  // clear()): a wholesale clear() at the cap wiped attribution for every
  // IN-FLIGHT JDBC operation at once (blank `user` fields under
  // sustained load), and execUser entries whose execution never posts an
  // end event would otherwise leak forever. Evicting the OLDEST entry
  // keeps recent in-flight work attributed while still capping memory.
  // Access is synchronizedMap: listener-bus events are single-threaded
  // but disable() clears from the caller's thread.
  private def boundedMap[K, V](cap: Int): java.util.Map[K, V] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[K, V](64, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[K, V]): Boolean = size() > cap
      })
  private val groupUser = boundedMap[String, String](4096)
  private val execUser = boundedMap[java.lang.Long, String](4096)
  // O(1) ring sizes (ConcurrentLinkedDeque.size() traverses every node
  // — on the shared listener-bus thread, per event)
  private val opCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val ringCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
  // per in-flight execution: accumulator id -> meaning, and running sums
  private val accumIndex = new ConcurrentHashMap[java.lang.Long, ConcurrentHashMap[java.lang.Long, MetricKey]]()
  private val accumToExec = new ConcurrentHashMap[java.lang.Long, java.lang.Long]()
  private val accumSums = new ConcurrentHashMap[java.lang.Long, java.util.concurrent.atomic.AtomicLong]()
  private val DefaultCapacity = 1000
  @volatile private var installedCapacity: Int = DefaultCapacity
  @volatile private var listener: Option[SparkListener] = None
  // the context the listener registered on: enable() after a
  // SparkContext restart must RE-REGISTER, not no-op (the old context's
  // listener bus died with it and profiling would silently record
  // nothing forever)
  @volatile private var listenerCtx: Option[org.apache.spark.SparkContext] = None

  private val SummedTypes = Set("sum", "size", "timing", "nsTiming")

  /** Index every metric accumulator of a plan tree (preorder node ids).
    * AQE re-plans mid-flight: later SparkPlanInfo versions ADD their
    * accumulators to the same execution's index (ids are unique per
    * accumulator, so stale entries just never receive updates). */
  private def indexPlan(execId: Long, plan: SparkPlanInfo): Unit = {
    val idx = accumIndex.computeIfAbsent(Long.box(execId),
      _ => new ConcurrentHashMap[java.lang.Long, MetricKey]())
    var nodeId = 0L
    def walk(n: SparkPlanInfo): Unit = {
      val id = nodeId; nodeId += 1
      n.metrics.foreach { m =>
        if (SummedTypes.contains(m.metricType)) {
          idx.put(Long.box(m.accumulatorId),
            MetricKey(id, n.nodeName, m.name, m.metricType))
          accumToExec.put(Long.box(m.accumulatorId), Long.box(execId))
        }
      }
      n.children.foreach(walk)
    }
    walk(plan)
  }

  private def addUpdate(accumId: Long, delta: Long): Unit =
    if (accumToExec.containsKey(Long.box(accumId)))
      accumSums.computeIfAbsent(Long.box(accumId),
        _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(delta)

  /** Emit operator rows for a finished execution and release its
    * tracking state. */
  private def finishOperators(execId: Long, capacity: Int): Unit = {
    val idx = accumIndex.remove(Long.box(execId))
    if (idx == null) return
    val rows = idx.entrySet().asScala.toSeq.flatMap { e =>
      val sum = Option(accumSums.remove(e.getKey)).map(_.get)
      accumToExec.remove(e.getKey)
      sum.filter(_ != 0L).map { v =>
        val k = e.getValue
        OperatorProfile(execId, k.nodeId, k.node, k.metric, k.metricType, v)
      }
    }.sortBy(r => (r.node_id, r.metric))
    // addFirst publishes newest-first: push the sorted rows in REVERSE
    // so they read back in (node_id, metric) order — pushing front-first
    // inverted the very sort one line above
    rows.reverseIterator.foreach { r =>
      opRing.addFirst(r); opCount.incrementAndGet() }
    while (opCount.get() > capacity * 16) {
      if (opRing.pollLast() != null) opCount.decrementAndGet()
      else opCount.set(0)
    }
  }

  private def firstLine(s: String): String =
    Option(s).map(_.trim.takeWhile(_ != '\n')).getOrElse("")

  /** Install the listener on the session's context (idempotent). The
    * ring and its capacity are JVM-wide, FIRST-CALLER-WINS: a later
    * enable() with a different capacity logs nothing and changes
    * nothing — requesting a larger ring after a smaller one was
    * installed is a silent no-op worth failing loudly on. */
  def enable(spark: SparkSession, capacity: Int = DefaultCapacity): Unit =
    synchronized {
      // a listener registered on a STOPPED context is dead weight —
      // treat it as absent so enable() on a fresh context re-registers
      if (listener.isDefined &&
          listenerCtx.forall(c => c.isStopped || (c ne spark.sparkContext))) {
        listener = None
        listenerCtx = None
        // the dead context's in-flight executions will never see their
        // SQLExecutionEnd — their tracking entries would otherwise
        // outlive every restart cycle and grow without bound (the rings
        // themselves are capacity-trimmed; these maps were not)
        inFlight.clear()
        accumIndex.clear()
        accumToExec.clear()
        accumSums.clear()
      }
      require(listener.isEmpty || capacity == installedCapacity,
        s"query-profile ring already installed with capacity " +
          s"$installedCapacity (JVM-wide, first caller wins) — got " +
          s"$capacity; call enable() with the same capacity or restart")
      if (listener.isEmpty) {
        installedCapacity = capacity
        val l = new SparkListener {
          override def onOtherEvent(event: SparkListenerEvent): Unit =
            event match {
              case s: SparkListenerSQLExecutionStart =>
                val tagUser = s.jobTags
                  .find(_.startsWith(graft.sources.AccessControl.UserTag))
                  .map(_.stripPrefix(graft.sources.AccessControl.UserTag))
                  .getOrElse("")
                inFlight.put(Long.box(s.executionId), Started(s.time,
                  firstLine(s.description),
                  firstLine(s.physicalPlanDescription), tagUser))
                indexPlan(s.executionId, s.sparkPlanInfo)
              case o if o.getClass.getName ==
                  "org.apache.spark.sql.hive.thriftserver.ui." +
                    "SparkListenerThriftServerOperationStart" =>
                // private[thriftserver] in source, public in bytecode —
                // reflection is the supported-surface-free way in
                try {
                  val g = o.getClass.getMethod("groupId").invoke(o)
                    .asInstanceOf[String]
                  val u = o.getClass.getMethod("userName").invoke(o)
                    .asInstanceOf[String]
                  // the map is bounded by construction (oldest-entry
                  // eviction) — a runaway JDBC client cannot grow it
                  if (g != null && u != null) groupUser.put(g, u)
                } catch { case _: ReflectiveOperationException => () }
              case u: SparkListenerSQLAdaptiveExecutionUpdate =>
                indexPlan(u.executionId, u.sparkPlanInfo)
              case d: SparkListenerDriverAccumUpdates =>
                // driver-side metrics (broadcast build, subquery time)
                d.accumUpdates.foreach { case (id, v) => addUpdate(id, v) }
              case e: SparkListenerSQLExecutionEnd =>
                val started = Option(inFlight.remove(Long.box(e.executionId)))
                val user = started.map(_.user).filter(_.nonEmpty)
                  .orElse(Option(execUser.remove(Long.box(e.executionId))))
                  .getOrElse("")
                ring.addFirst(Profile(e.time, e.executionId,
                  started.map(_.action).getOrElse("(unknown)"),
                  if (e.errorMessage.exists(_.nonEmpty)) "failed" else "success",
                  started.map(s => e.time - s.timeMs).getOrElse(0L),
                  started.map(_.planHead).getOrElse(""),
                  e.errorMessage.getOrElse(""), user))
                ringCount.incrementAndGet()
                while (ringCount.get() > capacity) {
                  if (ring.pollLast() != null) ringCount.decrementAndGet()
                  else ringCount.set(0)
                }
                finishOperators(e.executionId, capacity)
              case _ => ()
            }
          override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit =
            // SQL metric accumulators surface per task in accumulables;
            // `update` is this task's delta (a Long for SQL metrics).
            // SUCCESSFUL tasks only — failed/killed/speculative-duplicate
            // tasks also post updates, and summing them would inflate the
            // operator totals past what the work actually produced
            if (taskEnd.reason == org.apache.spark.Success)
              taskEnd.taskInfo.accumulables.foreach { a =>
                a.update.foreach {
                  case l: Long => addUpdate(a.id, l)
                  case s: String => s.toLongOption.foreach(addUpdate(a.id, _))
                  case _ => ()
                }
              }
          override def onJobStart(job: SparkListenerJobStart): Unit = {
            val execId = Option(job.properties)
              .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
              .map(_.toLong).getOrElse(-1L)
            if (execId >= 0)
              Option(job.properties)
                .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
                .flatMap(g => Option(groupUser.get(g)))
                .foreach(u => execUser.put(Long.box(execId), u))
            job.stageIds.foreach(sid =>
              stageToExec.put(Int.box(sid), Long.box(execId)))
            jobStages.put(Int.box(job.jobId), job.stageIds)
          }
          override def onJobEnd(job: SparkListenerJobEnd): Unit = {
            // SKIPPED stages (reused exchanges) never fire
            // onStageCompleted — drop their registrations here or the
            // map grows for the JVM lifetime on a long-lived driver
            Option(jobStages.remove(Int.box(job.jobId))).foreach(
              _.foreach(sid => stageToExec.remove(Int.box(sid))))
          }
          override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
            val info = sc.stageInfo
            // skipped stages may carry no metrics object
            val m = Option(info.taskMetrics)
            def g(f: org.apache.spark.executor.TaskMetrics => Long): Long =
              m.map(f).getOrElse(0L)
            val wall = (for {s <- info.submissionTime; c <- info.completionTime}
              yield c - s).getOrElse(0L)
            // get, not remove: a fetch-failure RESUBMISSION completes a
            // second attempt of the same stage id — removing on the
            // first attempt recorded the retry with execution_id -1.
            // Cleanup belongs to onJobEnd (which already handles it).
            val execId = Option(stageToExec.get(Int.box(info.stageId)))
              .map(_.longValue).getOrElse(-1L)
            stageRing.addFirst(StageProfile(execId, info.stageId,
              info.attemptNumber(), info.name.takeWhile(_ != '\n'),
              info.numTasks, wall, g(_.executorRunTime),
              g(_.inputMetrics.recordsRead), g(_.inputMetrics.bytesRead),
              g(_.outputMetrics.recordsWritten),
              g(_.outputMetrics.bytesWritten),
              g(_.shuffleReadMetrics.recordsRead),
              g(x => x.shuffleReadMetrics.remoteBytesRead +
                x.shuffleReadMetrics.localBytesRead),
              g(_.shuffleWriteMetrics.recordsWritten),
              g(_.shuffleWriteMetrics.bytesWritten)))
            stageCount.incrementAndGet()
            while (stageCount.get() > capacity * 4) {
              if (stageRing.pollLast() != null) stageCount.decrementAndGet()
              else stageCount.set(0)
            }
          }
        }
        spark.sparkContext.addSparkListener(l)
        listener = Some(l)
        listenerCtx = Some(spark.sparkContext)
      }
    }

  def disable(spark: SparkSession): Unit = synchronized {
    listener.foreach(spark.sparkContext.removeSparkListener)
    listener = None
    listenerCtx = None
    ring.clear()
    stageRing.clear()
    opRing.clear()
    stageToExec.clear()
    jobStages.clear() // in-flight jobs never see their onJobEnd now
    inFlight.clear()
    groupUser.clear()
    execUser.clear()
    accumIndex.clear()
    accumToExec.clear()
    accumSums.clear()
    ringCount.set(0)
    stageCount.set(0)
    opCount.set(0)
  }

  /** sys.profiles: newest first. */
  def profiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ring.iterator().asScala.toSeq
      .toDF("ts_ms", "execution_id", "action", "status", "duration_ms",
        "plan_head", "error", "user")
  }

  /** sys.profile_stages: per-stage metrics, newest first — join to
    * [[profiles]] on execution_id for Drill-style operator-level
    * profile depth. */
  def stageProfiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stageRing.iterator().asScala.toSeq.toDF(
      "execution_id", "stage_id", "attempt", "name", "num_tasks",
      "duration_ms", "executor_run_ms", "input_records", "input_bytes",
      "output_records", "output_bytes", "shuffle_read_records",
      "shuffle_read_bytes", "shuffle_write_records", "shuffle_write_bytes")
  }

  /** sys.profile_operators: per-OPERATOR metric rows of finished
    * executions (number of output rows, shuffle/spill bytes, build and
    * sort times — whatever SQL metrics the physical operators declare),
    * newest execution first — Drill's operator-level profile fragment
    * depth; join to [[profiles]] on execution_id. */
  def operatorProfiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    opRing.iterator().asScala.toSeq.toDF(
      "execution_id", "node_id", "node", "metric", "metric_type", "value")
  }
}
