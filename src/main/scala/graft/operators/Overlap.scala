package graft.operators

/** Overlap INDEPENDENT Spark-action-bearing computations from driver
  * threads (optimization guide §2.6): Spark's scheduler happily runs
  * several jobs at once inside one application — actions are only
  * sequential because driver code calls them sequentially. Entries
  * whose cost is a CHAIN of small sequential driver-scheduled jobs
  * (Lloyd fit rounds, persisted beam-probe hops, eager truth pins)
  * leave most of the cluster idle during every job's tail; when an
  * entry contains two or more such chains with NO data dependence,
  * submitting them from separate threads back-fills the idle
  * capacity and the entry's wall time drops from the SUM of the
  * chains to roughly their MAX.
  *
  * Results are unchanged by construction: the thunks must be
  * independent (enforced by the caller — nothing here shares state),
  * and Spark actions are thread-safe on one SparkSession. Errors
  * propagate: the first thunk failure is rethrown after all threads
  * finish, so a failing arm cannot be silently dropped.
  *
  * This is NOT result caching or precomputation — every thunk runs
  * its full computation inside the timed entry; only the submission
  * ORDER moves. */
object Overlap {

  /** Run the thunks concurrently (one plain thread each — the arity
    * in this codebase is 2-4, so a pool is overkill) and return their
    * results in input order. */
  def par[T](thunks: Seq[() => T]): Seq[T] = {
    require(thunks.nonEmpty, "Overlap.par: no thunks")
    val results = new Array[Any](thunks.length)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() =>
        try results(i) = t()
        catch { case e: Throwable => err.compareAndSet(null, e) },
        s"graft-overlap-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (err.get() != null) throw err.get()
    results.toSeq.map(_.asInstanceOf[T])
  }

  def par2[A, B](a: => A, b: => B): (A, B) = {
    val r = par(Seq(() => a, () => b))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B])
  }

  def par3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val r = par(Seq(() => a, () => b, () => c))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C])
  }

  def par4[A, B, C, D](a: => A, b: => B, c: => C, d: => D): (A, B, C, D) = {
    val r = par(Seq(() => a, () => b, () => c, () => d))
    (r(0).asInstanceOf[A], r(1).asInstanceOf[B], r(2).asInstanceOf[C],
      r(3).asInstanceOf[D])
  }
}
