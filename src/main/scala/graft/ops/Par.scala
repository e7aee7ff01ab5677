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
  * A small pool is deliberate: enough in flight to hide per-job latency,
  * not so many that concurrent scans fight for executor slots (the guide's
  * "2-3 jobs in flight is plenty"). Callers size it with [[gate]] so the
  * overlap SCALES DOWN with the session's cores — a fixed 4-way overlap
  * tuned on the 32-core rig oversubscribed 8-core hosts (r13 scaling run:
  * text_prepare_corpus 86.2 s at 8 cores vs 9.5 s at 32 — each overlapped
  * stage schedules multi-task jobs, and 3-4 of those over 8 task slots
  * thrash the scheduler instead of back-filling it).
  *
  * Failure semantics: the FIRST failing task rethrows its original
  * exception; queued tasks that have not started are cancelled and
  * in-flight tasks are interrupted (`shutdownNow`) — already-completed
  * side effects on earlier targets remain, exactly as with the sequential
  * loop, but no NEW target work starts after the failure is observed.
  */
private[graft] object Par {

  /** Concurrency for a host with `cores` task slots, capped at `cap`:
    * one overlapped job per ~8 cores, floored at 1 (sequential). 32 cores
    * → 4 (the measured fsck/maintenance sweet spot), 8 cores → 1.
    */
  def gate(cores: Int, cap: Int = 4): Int =
    math.min(cap, math.max(1, cores / 8))

  def mapOrdered[A, B](items: Seq[A], inFlight: Int = 4)(f: A => B): Seq[B] = {
    if (items.size <= 1 || inFlight <= 1) return items.map(f)
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
          // unwrap so callers see the original failure, not the wrapper;
          // cancel everything still queued/running first so a failed run
          // stops mutating later targets (ADVICE r13)
          case e: java.util.concurrent.ExecutionException =>
            futures.foreach(_.cancel(true))
            throw e.getCause
        }
      }
    } finally { pool.shutdownNow(); () }
  }
}
