package graft.enrich

/** E1 (`/root/reference/main.py:606-629`): sliding-window rate limiter —
  * at most `maxPerMinute` acquisitions in any trailing 60 s window,
  * sleeping until the oldest timestamp expires.
  *
  * Distribution note (SURVEY.md §7.4): the reference's limiter is global
  * because it runs in one process. On a cluster there is no cheap global
  * window, so the engine gives each task a per-partition budget of
  * `maxPerMinute / numPartitions` (configured by the runner). Total
  * throughput matches; burst shape differs — a documented semantic
  * relaxation. `nowMs`/`sleepMs` are injectable for deterministic tests.
  */
final class SlidingWindowRateLimiter(
    maxPerMinute: Int,
    nowMs: () => Long = () => System.currentTimeMillis(),
    sleepMs: Long => Unit = Thread.sleep) extends Serializable {

  require(maxPerMinute >= 1, "rate must be >= 1/min")
  private val windowMs = 60000L
  private val times = scala.collection.mutable.Queue.empty[Long]

  /** Blocks until a request slot is free; returns the wait in ms. */
  def acquire(): Long = synchronized {
    var waited = 0L
    var t = nowMs()
    while (times.nonEmpty && times.head <= t - windowMs) times.dequeue()
    if (times.size >= maxPerMinute) {
      val wait = times.head + windowMs - t   // oldest request expiry (main.py:620-627)
      if (wait > 0) { sleepMs(wait); waited = wait }
      t = nowMs()
      while (times.nonEmpty && times.head <= t - windowMs) times.dequeue()
    }
    times.enqueue(t)
    waited
  }
}
