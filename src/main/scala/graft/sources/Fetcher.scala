package graft.sources

/** S1/S3 fetch adapter (SURVEY.md §2.1): scraping itself is external
  * to the engine (BASELINE.json), but the reference's retry policy is
  * configuration a user would otherwise re-derive — encoded here as a
  * driver-side trait with an injectable clock/sleep for tests.
  *
  * Reference semantics (bovada_pull.py:14-42): fetch; if the payload
  * fails the `minChars` sanity check ("sometimes the scrape doesn't
  * scrape the right portion of the website"), check the elapsed time
  * — give up once `deadlineMs` has passed since the FIRST attempt,
  * else sleep `backoffMs` and refetch. Giving up yields None (the
  * reference's `skip_bovada` string sentinel, made typed): downstream
  * the pipeline proceeds with an empty, correctly-schemed DataFrame
  * (pipeline.Normalize.withBovada handles the missing column).
  */
trait Fetcher {
  /** One fetch attempt; null/short payloads count as failed. */
  def fetchOnce(): String
}

final class RetryPolicy(
    backoffMs: Long = 2000,
    deadlineMs: Long = 60000,
    minChars: Int = 250,
    clock: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep) {

  /** Some(payload) once a fetch passes the sanity check; None when
    * the deadline elapses first (checked after each failed attempt,
    * like the reference — one attempt always runs). */
  def run(fetcher: Fetcher): Option[String] = {
    val start = clock()
    while (true) {
      val payload = fetcher.fetchOnce()
      if (payload != null && payload.length >= minChars) return Some(payload)
      if (clock() - start >= deadlineMs) return None
      sleep(backoffMs)
    }
    None // unreachable
  }
}

/** Fetch -> snapshot glue closing the S1/S3 loop: a payload that
  * passes the retry policy lands as a timestamped `.html` snapshot in
  * the directory `spark.read.format("odds-html")` scans — fetch and
  * scan compose without a manual step between. Hadoop FileSystem API,
  * so `dir` works for local paths and object storage alike.
  *
  * Concurrent-reader safety: the payload is written to a `.tmp` name
  * (invisible to the source, which lists `*.html` only) and RENAMED
  * into place, so a scan never sees a partial snapshot. */
object SnapshotWriter {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path

  /** JVM-wide sequence making tmp names unique even when two writers
    * share a clock millisecond (ADVICE r4: a millis-only tmp name let
    * concurrent fetches clobber each other mid-write). */
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Run the policy; on success write `snapshot_<millis>.html` into
    * `dir` and return its path, None when the fetch gave up. The
    * clock is injectable like RetryPolicy's (tests pin filenames).
    * Same-millisecond snapshots land as `snapshot_<millis>_<n>.html`
    * rather than silently replacing the earlier one (local-FS rename
    * onto an existing path does not raise). */
  def fetchToSnapshot(fetcher: Fetcher, policy: RetryPolicy, dir: String,
                      conf: Configuration = new Configuration(),
                      clock: () => Long = () => System.currentTimeMillis())
      : Option[String] =
    policy.run(fetcher).map { html =>
      val d = new Path(dir)
      val fs = d.getFileSystem(conf)
      fs.mkdirs(d)
      val ts = clock()
      val tmp = new Path(d, s".snapshot_$ts.${seq.incrementAndGet()}.html.tmp")
      // overwrite = false: the sequence makes collisions a bug, and a
      // silent overwrite would hide it
      val out = fs.create(tmp, false)
      try out.write(html.getBytes("UTF-8")) finally out.close()
      var dst = new Path(d, s"snapshot_$ts.html")
      var n = 0
      while (fs.exists(dst)) {
        n += 1
        dst = new Path(d, s"snapshot_${ts}_$n.html")
      }
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"SnapshotWriter: rename to $dst failed")
      dst.toString
    }
}
