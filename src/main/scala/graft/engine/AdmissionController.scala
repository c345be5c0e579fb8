package graft.engine

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{Semaphore, TimeUnit}

/** Server-wide statement admission control, re-implementing the reference's
  * `AdmissionController` semantics
  * (`/root/reference/src/common/include/detail/admission_controller.h:96-177`):
  * N concurrent slots, a bounded wait queue (default 8x concurrency,
  * `gizmosql_library.h:42-44`), a max queue wait, an abort predicate (killed
  * session), and an admin/bypass path. Unlimited (slots <= 0) fails open.
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

  private val slots = if (maxConcurrent > 0) new Semaphore(maxConcurrent, true) else null
  private val queued = new AtomicInteger(0)
  private val queueCapacity = if (maxQueued > 0) maxQueued else math.max(8 * maxConcurrent, 8)

  def running: Int = if (slots == null) 0 else maxConcurrent - slots.availablePermits()
  def waiting: Int = queued.get()

  /** Acquire a slot, waiting up to the deadline; `aborted` is polled so a
    * killed session stops waiting (reference: abort predicate + waiter
    * wake-up on KILL SESSION).
    */
  def acquire(bypass: Boolean = false, aborted: () => Boolean = () => false): Admission = {
    if (slots == null || bypass) return if (bypass) Bypassed else Admitted
    if (slots.tryAcquire()) return Admitted
    if (queued.incrementAndGet() > queueCapacity) {
      queued.decrementAndGet()
      return Rejected(s"statement queue full ($queueCapacity waiters)")
    }
    try {
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(maxQueueWaitSeconds)
      while (System.nanoTime() < deadline) {
        if (aborted()) return Rejected("session killed while queued")
        if (slots.tryAcquire(100, TimeUnit.MILLISECONDS)) return Admitted
      }
      Rejected(s"timed out after ${maxQueueWaitSeconds}s in statement queue")
    } finally queued.decrementAndGet()
  }

  def release(admission: Admission): Unit = admission match {
    case Admitted if slots != null => slots.release()
    case _ =>
  }

  /** Run `f` under a slot. */
  def withSlot[A](bypass: Boolean = false, aborted: () => Boolean = () => false)(f: => A): A =
    acquire(bypass, aborted) match {
      case r: Rejected => throw new IllegalStateException(s"admission rejected: ${r.reason}")
      case a => try f finally release(a)
    }
}
