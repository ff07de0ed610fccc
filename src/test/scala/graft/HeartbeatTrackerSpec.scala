package graft

import graft.model.Position
import graft.order.HeartbeatTracker
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference watermark-tracker behavior
  * (tests/hb_tracker/hb_tracker_test.go:10-88): 3 streams with a
  * 1+1+2 partition layout; quorum requires all four slots; quorum is
  * the min; commit evicts; newer heartbeats survive eviction.
  */
class HeartbeatTrackerSpec extends AnyFunSuite {

  private def mk() = new HeartbeatTracker(Set((0, 0L), (1, 0L), (2, 0L), (2, 1L)))

  test("no quorum until every partition of every stream reported") {
    val t = mk()
    assert(t.quorum.isEmpty)
    t.add(0, 0L, Position(4, 0))
    t.add(1, 0L, Position(5, 0))
    t.add(2, 0L, Position(6, 0))
    assert(t.quorum.isEmpty) // (2,1) missing
    t.add(2, 1L, Position(7, 0))
    assert(t.quorum.contains(Position(4, 0)))
  }

  test("quorum is the min of per-partition maxima; newer hb replaces older") {
    val t = mk()
    t.add(0, 0L, Position(4, 0))
    t.add(0, 0L, Position(9, 0)) // replaces
    t.add(0, 0L, Position(2, 0)) // regression ignored
    t.add(1, 0L, Position(5, 0))
    t.add(2, 0L, Position(6, 0))
    t.add(2, 1L, Position(5, 5))
    assert(t.quorum.contains(Position(5, 0)))
  }

  test("commit evicts slots at/below the quorum; newer survive") {
    val t = mk()
    t.add(0, 0L, Position(4, 0))
    t.add(1, 0L, Position(5, 0))
    t.add(2, 0L, Position(6, 0))
    t.add(2, 1L, Position(7, 0))
    val q = t.quorum.get
    t.commit(q)
    assert(t.quorum.isEmpty) // slot (0,0) evicted, must re-report
    t.add(0, 0L, Position(5, 0))
    assert(t.quorum.contains(Position(5, 0)))
  }

  test("unknown partitions are ignored") {
    val t = mk()
    assert(!t.add(9, 9L, Position(1, 0)))
  }

  test("quorumAfter gates on strictly greater (initial-scan sync)") {
    val t = mk()
    Seq((0, 0L), (1, 0L), (2, 0L), (2, 1L)).foreach { case (s, p) =>
      t.add(s, p, Position(5, 0))
    }
    assert(t.quorumAfter(Position(5, 0)).isEmpty)
    assert(t.quorumAfter(Position(4, 9)).contains(Position(5, 0)))
  }

  test("unsigned-64 ordering: huge uint64 steps compare correctly") {
    // -1L is 18446744073709551615 as unsigned — must be the max
    val t = mk()
    Seq((0, 0L), (1, 0L), (2, 0L)).foreach { case (s, p) =>
      t.add(s, p, Position(-1L, 0))
    }
    t.add(2, 1L, Position(3, 0))
    assert(t.quorum.contains(Position(3, 0)))
    assert(t.maxHb.contains(Position(-1L, 0)))
    assert(Position(3, 0).lessThan(Position(-1L, 0)))
    assert(!Position(-1L, 0).lessThan(Position(3, 0)))
  }
}
