package graft

import graft.sink.LeaseLock
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Lease-lock behavior ported from the reference locker suite
  * (ydb_locker/locker_test.go): single holder, contention, expiry
  * takeover, renewal, owner check.
  */
class LeaseLockSpec extends AnyFunSuite {

  test("single owner acquires; second instance is refused until expiry") {
    val root = Files.createTempDirectory("lock").toString
    var now = 1000L
    val clock = () => now
    val a = new LeaseLock(root, "a", 100L, clock)
    val b = new LeaseLock(root, "b", 100L, clock)
    assert(a.tryAcquire())
    assert(!b.tryAcquire())
    assert(a.verifyHeld() && !b.verifyHeld())
    // renewal extends the lease
    now = 1090L
    assert(a.tryAcquire())
    now = 1180L // original deadline passed, renewed one has not
    assert(!b.tryAcquire())
    // expiry → takeover
    now = 1300L
    assert(b.tryAcquire())
    assert(b.verifyHeld() && !a.verifyHeld())
  }

  test("release frees the lock only for the owner") {
    val root = Files.createTempDirectory("lock2").toString
    var now = 0L
    val a = new LeaseLock(root, "a", 100L, () => now)
    val b = new LeaseLock(root, "b", 100L, () => now)
    assert(a.tryAcquire())
    b.release() // non-owner release is a no-op
    assert(a.verifyHeld())
    a.release()
    assert(b.tryAcquire())
  }
}
