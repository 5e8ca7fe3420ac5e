package graft.ops

/** Bounded resource pool (ref core/resources.py:136 `ResourcePool`,
  * :75 `pooled_connection`).
  *
  * Executor-side plumbing for resources whose construction dominates
  * their use — JDBC connections above all: a fleet writing thousands
  * of partitions through [[graft.sources.Jdbc.executeBatch]] would
  * otherwise open one TCP + auth handshake PER TASK against the same
  * database. One pool per (JVM, target) caps that at `maxSize`
  * concurrent handshakes and reuses them across tasks.
  *
  * Semantics mirror the reference: acquire reuses a pooled instance if
  * one is idle, else creates (the pool bounds IDLE retention, not
  * concurrent outstanding resources — an exhausted pool creates rather
  * than blocks, resources.py:173); release re-pools under the cap and
  * closes past it. `validate` (absent in the reference, required for
  * real connections) is checked on acquire: a stale resource is closed
  * and replaced instead of handed out.
  */
final class ResourcePool[T](
    factory: () => T,
    maxSize: Int = 5,
    closer: T => Unit = (_: T) => (),
    validate: T => Boolean = (_: T) => true) {
  require(maxSize >= 1, s"maxSize must be >= 1, got $maxSize")

  private val idle = new java.util.ArrayDeque[T]()
  private var createdCount = 0L
  private var reusedCount = 0L

  /** resources.py:160 `acquire`. */
  def acquire(): T = {
    while (true) {
      val pooled = this.synchronized(Option(idle.pollFirst()))
      pooled match {
        case None =>
          this.synchronized { createdCount += 1 }
          return factory()
        case Some(r) if validate(r) =>
          this.synchronized { reusedCount += 1 }
          return r
        case Some(r) =>
          try closer(r) catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** resources.py:175 `release`: re-pool under the cap, close past it. */
  def release(r: T): Unit = {
    val pooled = this.synchronized {
      if (idle.size < maxSize) { idle.addFirst(r); true } else false
    }
    if (!pooled) try closer(r) catch { case scala.util.control.NonFatal(_) => () }
  }

  /** resources.py:192 `get_resource` context manager. */
  def withResource[A](f: T => A): A = {
    val r = acquire()
    try {
      val out = f(r)
      release(r)
      out
    } catch {
      case e: Throwable =>
        // resources.py:47 cleanup_on_error: a resource that saw a
        // failure is closed, never re-pooled (it may be mid-transaction)
        try closer(r) catch { case scala.util.control.NonFatal(_) => () }
        throw e
    }
  }

  /** Close every idle resource (JVM shutdown / test teardown). */
  def drain(): Unit = {
    val all = this.synchronized {
      val xs = new scala.collection.mutable.ArrayBuffer[T](idle.size)
      while (!idle.isEmpty) xs += idle.pollFirst()
      xs.toSeq
    }
    all.foreach(r => try closer(r) catch { case scala.util.control.NonFatal(_) => () })
  }

  /** (created, reused, idle) — what a spec asserts. */
  def stats: (Long, Long, Int) =
    this.synchronized((createdCount, reusedCount, idle.size))
}
