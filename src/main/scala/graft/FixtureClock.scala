package graft

/** Fixture-time accounting for the DDL/streaming chain queries.
  *
  * Chain queries (q98*, q100–q108) are self-contained by the driver's
  * contract: each run REBUILDS its input fixture (a CH table loaded
  * through INSERT, a streaming landing directory) and then exercises
  * the operator under test. That keeps the correctness gate hermetic,
  * but it folds fixture I/O into the benchmark number — by round 13
  * the committed artifact's entire top-10 was fixture-dominated, so a
  * real plan regression could hide inside landing-write noise (the
  * round's q103 "1.62×" was exactly that ghost).
  *
  * Queries wrap ONLY their fixture-build section in [[time]]; `Bench`
  * resets the accumulator per run, reads it after, and reports
  * {setup_s, query_s} per query, ranking its top-10 on query_s. The
  * driver's Verify ignores all of this — the accumulator is a no-op
  * side channel there.
  *
  * Accumulates into a plain AtomicLong (not a thread-local): Bench
  * runs queries sequentially on one thread, and fixture sections that
  * hand work to Spark jobs spend their time off-thread anyway — the
  * wall-clock bracket is the honest measure.
  */
object FixtureClock {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val depth = new ThreadLocal[Integer] { override def initialValue(): Integer = 0 }

  def reset(): Unit = acc.set(0L)

  /** Nanoseconds of fixture time accumulated since the last reset. */
  def nanos: Long = acc.get

  /** Bracket a fixture-build section. Nesting-safe: only the
    * OUTERMOST bracket on a thread accumulates, so a fixture helper
    * that brackets its own body can be called from inside a query's
    * bracket without double-counting (double-counting would push
    * `setup` past wall-clock and silently zero the query's reported
    * plan time in Bench). */
  def time[T](f: => T): T = {
    val d = depth.get
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f finally {
      depth.set(d)
      if (d == 0) acc.addAndGet(System.nanoTime() - t0)
    }
  }
}
