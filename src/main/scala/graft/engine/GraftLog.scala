package graft.engine

import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Structured log records + the secondary-sink FORK, re-expressing the
  * reference's logging dispatch (`/root/reference/src/common/
  * gizmosql_logging.cpp:575` RegisterLogSink; record shape
  * `detail/gizmosql_logging.h:118-137`): every emitted record goes to the
  * primary console sink AND to each registered secondary sink (the catalog
  * log sink enqueues from here). Sinks must be cheap and non-blocking; a
  * thread-local recursion guard drops any record emitted from WITHIN sink
  * delivery, so a sink's own error logging can never loop back into itself
  * (the reference's ScopedLogSinkGuard).
  */
object GraftLog {

  /** The reference's LogRecord, promoted fields + JSON catch-all. Empty
    * string = unset (mapped to NULL at the catalog sink).
    */
  final case class LogRecord(
      timestampMs: Long,
      level: String, // INFO | WARNING | ERROR
      message: String,
      component: String = "",
      instanceId: String = "",
      clusterId: String = "",
      sessionId: String = "",
      username: String = "",
      role: String = "",
      peer: String = "",
      traceId: String = "",
      spanId: String = "",
      pid: Int = ProcessHandle.current().pid().toInt,
      tid: String = Thread.currentThread().getName,
      sourceFile: String = "",
      sourceLine: Int = 0,
      func: String = "",
      fieldsJson: String = "")

  type LogSink = LogRecord => Unit

  /** Severity ordering, the reference's ArrowLogLevel subset. */
  object Levels {
    private val order = Map("DEBUG" -> 0, "INFO" -> 1, "WARNING" -> 2, "ERROR" -> 3)
    def of(s: String): Int = {
      val n = Option(s).getOrElse("").trim.toUpperCase match {
        case "WARN" => "WARNING"
        case x => x
      }
      order.getOrElse(n, 1) // unknown levels read as INFO
    }
    def atLeast(natural: String, threshold: String): Boolean = of(natural) >= of(threshold)
  }

  /** Overall logger threshold (the reference's default-logger severity
    * gate): records below it are dropped REGARDLESS of component
    * thresholds — both gates must be satisfied
    * (`test_log_level_filtering.cpp:286` BothThresholdsMustBeSatisfied).
    */
  @volatile var overallThreshold: String =
    sys.env.getOrElse("GIZMOSQL_LOG_LEVEL", "debug")

  /** Dynamic-at emission (the reference's GIZMOSQL_LOGKV_*_DYNAMIC_AT,
    * `gizmosql_logging.h:363-372`): emit `record` only when its NATURAL
    * severity clears `threshold` — a message below the component threshold
    * is SUPPRESSED, never promoted to the threshold severity (the
    * regression the reference's issue #136 tests pin).
    */
  def logDynamicAt(threshold: String, record: => LogRecord): Unit = {
    val r = record
    if (Levels.atLeast(r.level, threshold)) log(r)
  }

  private val sinks = new CopyOnWriteArrayList[LogSink]()
  private val inSinkDelivery: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** Register a secondary sink; returns the sink as a handle for
    * [[removeSink]]. A server must unregister only its OWN sink on close —
    * `clearSinks()` would silently detach every other server's catalog
    * logging in the same JVM (common when tests/embedders run two servers).
    */
  def registerSink(sink: LogSink): LogSink = { sinks.add(sink); sink }
  def removeSink(sink: LogSink): Unit = { sinks.remove(sink); () }
  def clearSinks(): Unit = sinks.clear()
  def sinkCount: Int = sinks.size()

  /** Run `f` with sink delivery suppressed on this thread — the catalog
    * sink's writer thread wraps its whole loop in this so its own warnings
    * go only to the console.
    */
  def withSinkGuard[T](f: => T): T = {
    val prev = inSinkDelivery.get()
    inSinkDelivery.set(java.lang.Boolean.TRUE)
    try f finally inSinkDelivery.set(prev)
  }

  /** Emit one record: WARN/ERROR print to stderr (the primary console
    * sink); every record forks to the registered secondary sinks unless
    * this thread is already inside sink delivery.
    */
  def log(record: LogRecord): Unit = {
    if (!Levels.atLeast(record.level, overallThreshold)) return
    if (record.level == "WARNING" || record.level == "ERROR")
      System.err.println(s"[graft][${record.level.toLowerCase}] " +
        (if (record.component.nonEmpty) s"${record.component}: " else "") + record.message)
    if (!inSinkDelivery.get()) {
      withSinkGuard {
        sinks.iterator().asScala.foreach { s =>
          try s(record) catch { case scala.util.control.NonFatal(_) => }
        }
      }
    }
  }

  def info(component: String, message: String, sessionId: String = "",
      username: String = "", fieldsJson: String = ""): Unit =
    log(LogRecord(System.currentTimeMillis(), "INFO", message, component,
      sessionId = sessionId, username = username, fieldsJson = fieldsJson))

  def warn(component: String, message: String): Unit =
    log(LogRecord(System.currentTimeMillis(), "WARNING", message, component))
}
