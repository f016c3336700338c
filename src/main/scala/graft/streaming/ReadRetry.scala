package graft.streaming

/** The reader-side retry protocol shared by every cross-JVM subscriber
  * ([[GraphReader]], [[graft.sources.LakeTable.pollChanges]]): a read that
  * loses the race to a maintainer's in-loop sweep re-resolves and retries
  * within an ELAPSED-TIME window — never a fixed retry count, because a
  * scan slower than two fold intervals is a slow host, not a broken
  * retention clamp — with a brief pause between attempts so a persistent
  * failure doesn't hot-loop full Spark jobs for the whole window. The
  * window expiring rethrows the last failure loud (SCALE.md's reader
  * contract: recover from a lost race, never mask a real fault forever).
  */
private[graft] object ReadRetry {

  /** Run `f`, retrying on any `Exception` until `windowMs` of elapsed
    * time has passed since the first attempt; `onRetry` fires before each
    * re-attempt (telemetry — the bench counters ride it). `f` must be
    * idempotent: a pure read, or an at-least-once step whose consumer is
    * idempotent by contract.
    */
  def retryFor[T](windowMs: Long, onRetry: () => Unit = () => ())(f: => T): T = {
    val deadline = System.nanoTime() + windowMs * 1000000L
    var out: Option[T] = None
    while (out.isEmpty) {
      try out = Some(f)
      catch { case e: Exception =>
        if (System.nanoTime() - deadline > 0) throw e
        onRetry(); Thread.sleep(50)
      }
    }
    out.get
  }
}
