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

  test("concurrent takeover of an expired lease has exactly one winner") {
    // repeat the race: any read-then-write hole shows up as 2 winners
    (0 until 20).foreach { round =>
      val root = Files.createTempDirectory(s"lockrace$round").toString
      val dead = new LeaseLock(root, "dead", ttlMillis = -1L) // born expired
      assert(dead.tryAcquire())
      val locks = (0 until 8).map(i => new LeaseLock(root, s"w$i", 60000L))
      val barrier = new java.util.concurrent.CyclicBarrier(locks.size)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = locks.map { l =>
        new Thread(() => {
          barrier.await()
          if (l.tryAcquire()) wins.incrementAndGet()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(wins.get() == 1, s"round $round: ${wins.get()} winners")
    }
  }

  test("fencing token increases across owners and fences stale commits") {
    val root = Files.createTempDirectory("lockfence").toString
    var now = 1000L
    val clock = () => now
    val a = new LeaseLock(root, "a", 100L, clock)
    val b = new LeaseLock(root, "b", 100L, clock)
    assert(a.tryAcquire())
    val ta = a.heldToken.get
    assert(a.tryAcquire()) // renewal keeps the token
    assert(a.heldToken.contains(ta))
    now = 2000L // a expired; b takes over with a STRICTLY greater token
    assert(b.tryAcquire())
    assert(b.heldToken.get > ta)
    assert(!a.verifyHeld() && b.verifyHeld())

    // manifest-level fence: a's stale token is refused once b committed
    graft.sink.TransactionalStore.initIfAbsent(root, "a", Seq("t"))
    val man = graft.sink.TransactionalStore.read(root)
    graft.sink.TransactionalStore.commit(root,
      man.copy(version = man.version + 1, fencingToken = b.heldToken.get))
    intercept[IllegalStateException] {
      graft.sink.TransactionalStore.commit(root,
        man.copy(version = man.version + 2, fencingToken = ta))
    }
  }

  test("graceful release keeps tokens monotonic for the next owner") {
    val root = Files.createTempDirectory("lockrel").toString
    val a = new LeaseLock(root, "a", 60000L)
    val b = new LeaseLock(root, "b", 60000L)
    assert(a.tryAcquire())
    val ta = a.heldToken.get
    a.release()
    assert(b.tryAcquire())
    assert(b.heldToken.get > ta)
  }
}
