package graft.engine

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.TimeUnit

/** Server-wide statement admission control, re-implementing the reference's
  * `AdmissionController` semantics
  * (`/root/reference/src/common/include/detail/admission_controller.h:96-177`):
  * N concurrent slots, a bounded wait queue (default 8x concurrency,
  * `gizmosql_library.h:42-44`), a max queue wait, an abort predicate (killed
  * session), and an admin/bypass path. Unlimited (slots <= 0) fails open.
  *
  * Limits are DYNAMIC (`resize`): `SET GLOBAL gizmosql.max_*` retunes the
  * live controller instead of swapping in a fresh one, so the running count
  * survives the change — lowering the limit under load admits nothing new
  * until in-flight statements drain below it (a swapped-in controller would
  * transiently admit old-running + new-limit statements, defeating exactly
  * the load-shedding the SET was issued for). Admissions are counted even in
  * unlimited mode so a later downsize sees the true in-flight count.
  *
  * In the Spark rebuild this guards job submission on the driver: a slot is
  * held for the lifetime of a statement's action, bounding concurrent Spark
  * jobs regardless of cluster size.
  */
final class AdmissionController(
    maxConcurrent: Int,
    maxQueued: Int,
    maxQueueWaitSeconds: Long) {

  sealed trait Admission
  case object Admitted extends Admission
  case object Bypassed extends Admission
  final case class Rejected(reason: String) extends Admission

  private val lock = new Object
  private var curMaxConcurrent = maxConcurrent
  private var curMaxQueued = maxQueued
  private var curMaxQueueWaitSeconds = maxQueueWaitSeconds
  private var runningCount = 0
  private val queuedCount = new AtomicInteger(0)

  private def queueCapacity: Int =
    if (curMaxQueued > 0) curMaxQueued else math.max(8 * curMaxConcurrent, 8)

  /** Retune limits in place; raising the concurrency wakes queued waiters. */
  def resize(newMaxConcurrent: Int, newMaxQueued: Int, newMaxQueueWaitSeconds: Long): Unit =
    lock.synchronized {
      curMaxConcurrent = newMaxConcurrent
      curMaxQueued = newMaxQueued
      curMaxQueueWaitSeconds = newMaxQueueWaitSeconds
      lock.notifyAll()
    }

  def running: Int = lock.synchronized(runningCount)
  def waiting: Int = queuedCount.get()

  /** Acquire a slot, waiting up to the deadline; `aborted` is polled so a
    * killed session stops waiting (reference: abort predicate + waiter
    * wake-up on KILL SESSION).
    */
  def acquire(bypass: Boolean = false, aborted: () => Boolean = () => false): Admission = {
    if (bypass) return Bypassed
    val (admitted, capacity, waitSeconds) = lock.synchronized {
      if (curMaxConcurrent <= 0 || runningCount < curMaxConcurrent) {
        runningCount += 1
        (true, 0, 0L)
      } else (false, queueCapacity, curMaxQueueWaitSeconds)
    }
    if (admitted) return Admitted
    if (queuedCount.incrementAndGet() > capacity) {
      queuedCount.decrementAndGet()
      return Rejected(s"statement queue full ($capacity waiters)")
    }
    try {
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(waitSeconds)
      lock.synchronized {
        while (true) {
          if (aborted()) return Rejected("session killed while queued")
          if (curMaxConcurrent <= 0 || runningCount < curMaxConcurrent) {
            runningCount += 1
            return Admitted
          }
          val remainingMs = (deadline - System.nanoTime()) / 1000000L
          if (remainingMs <= 0)
            return Rejected(s"timed out after ${waitSeconds}s in statement queue")
          lock.wait(math.min(100L, remainingMs))
        }
      }
      throw new IllegalStateException("unreachable")
    } finally queuedCount.decrementAndGet()
  }

  def release(admission: Admission): Unit = admission match {
    case Admitted => lock.synchronized {
      runningCount = math.max(0, runningCount - 1)
      lock.notifyAll()
    }
    case _ =>
  }

  /** Run `f` under a slot. */
  def withSlot[A](bypass: Boolean = false, aborted: () => Boolean = () => false)(f: => A): A =
    acquire(bypass, aborted) match {
      case r: Rejected => throw new IllegalStateException(s"admission rejected: ${r.reason}")
      case a => try f finally release(a)
    }
}
