package graft.ops

/** Bounded-concurrency ordered map for independent per-target Spark work
  * (guide §2.6: actions are only sequential because driver code calls them
  * sequentially — overlapping independent jobs lets the next target's tiny
  * jobs back-fill the scheduler gaps of the current one).
  *
  * Used by the audit/maintenance orchestrators, whose per-target passes are
  * dominated by driver-side latency between many small jobs (the r13
  * profile: ops_fsck_report = 73 jobs, 4.0 s of summed job wall inside
  * 7.3 s measured — the other 3.3 s was sequential inter-job gap). Targets
  * are DISTINCT directories by contract, so cross-target work shares no
  * files; results return in input order, so composed output is identical
  * to the sequential loop's.
  *
  * A small fixed pool (default 4) is deliberate: enough in flight to hide
  * per-job latency, not so many that concurrent scans fight for executor
  * slots (the guide's "2-3 jobs in flight is plenty"). Exceptions from a
  * task propagate to the caller exactly like the sequential loop — the
  * first failure rethrows after the pool drains.
  */
private[graft] object Par {

  def mapOrdered[A, B](items: Seq[A], inFlight: Int = 4)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(inFlight, items.size))
    try {
      val futures = items.map(a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        }))
      futures.map { fut =>
        try fut.get()
        catch {
          // unwrap so callers see the original failure, not the wrapper
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally { pool.shutdown(); () }
  }
}
