package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** The maintenance-mutex edge semantics hardened in round 10 (ADVICE
  * r9): stale-lock breaking claims by ATOMIC RENAME (a losing breaker
  * never touches any lock file), and release verifies the holder
  * token before deleting — a successor's fresh lock can never be
  * removed by a slow predecessor's finally block. The registry-level
  * break/abort behavior is covered by GenIndexLifecycleSpec's MUTEX
  * tests; these rows pin the raw RegistryIO contract directly. */
class RegistryIoLockSpec extends SparkSpec {

  private def fsFor(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("release is token-verified: a successor's fresh lock survives a " +
    "slow predecessor's finally block") {
    val dir = Files.createTempDirectory("graft_lock_succ_").toString
    val lock = s"$dir/the_lock"
    val fs = fsFor(lock)
    val p = new org.apache.hadoop.fs.Path(lock)
    RegistryIO.withMaintenanceLock(fs, lock, "spec") {
      // simulate a breaker that (correctly or not) claimed our lock
      // mid-body and created its own: the predecessor's release must
      // NOT remove it
      fs.delete(p, false)
      RegistryIO.writeLines(fs, lock, Seq("pid=9999 t=0 u=foreign-holder"))
    }
    assert(fs.exists(p),
      "release deleted a lock it no longer owns — the successor's " +
        "maintenance would run unprotected")
    assert(RegistryIO.readLines(fs, lock).get.head.contains("foreign-holder"))
  }

  test("release removes OUR lock on the normal path, and a vanished " +
    "lock does not fail the release") {
    val dir = Files.createTempDirectory("graft_lock_norm_").toString
    val lock = s"$dir/the_lock"
    val fs = fsFor(lock)
    val p = new org.apache.hadoop.fs.Path(lock)
    var ran = false
    RegistryIO.withMaintenanceLock(fs, lock, "spec") {
      ran = true
      assert(fs.exists(p), "the lock must exist while the body runs")
    }
    assert(ran)
    assert(!fs.exists(p), "normal release must remove the holder's lock")
    // lock vanished mid-body (a breaker raced us but did not recreate):
    // release is a silent no-op, not a crash
    RegistryIO.withMaintenanceLock(fs, lock, "spec") {
      fs.delete(p, false)
    }
    assert(!fs.exists(p))
  }

  test("stale break claims by rename: the tombstone never survives, the " +
    "winner holds a fresh token, and a FRESH foreign lock still blocks") {
    val dir = Files.createTempDirectory("graft_lock_stale_").toString
    val lock = s"$dir/the_lock"
    val fs = fsFor(lock)
    val p = new org.apache.hadoop.fs.Path(lock)
    // fresh foreign lock: blocks loudly
    RegistryIO.writeLines(fs, lock, Seq("pid=1 t=0 u=live-foreign"))
    intercept[IllegalStateException] {
      RegistryIO.withMaintenanceLock(fs, lock, "spec") { fail("must not run") }
    }
    assert(RegistryIO.readLines(fs, lock).get.head.contains("live-foreign"),
      "a blocked attempt must not disturb the live holder's lock")
    // backdate past the horizon: the next attempt rename-claims it,
    // runs, and leaves no debris (no lock, no *.broken.* tombstone)
    fs.setTimes(p, System.currentTimeMillis() - 2L * 60 * 60 * 1000, -1)
    var ran = false
    RegistryIO.withMaintenanceLock(fs, lock, "spec") { ran = true }
    assert(ran, "a stale lock must be broken, not block forever")
    assert(!fs.exists(p))
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.contains(".broken."))
    assert(leftovers.isEmpty,
      s"rename-claim tombstones must be deleted by the winner: $leftovers")
  }
}
