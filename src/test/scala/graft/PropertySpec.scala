package graft

import graft.merge.LwwMerge
import graft.model.{ChangeRecord, Op, Position}
import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: the ordering is a total order over the full
  * unsigned-64 domain; the LWW Aggregator buffer is order-free
  * (fold order and split points never change the result) — the
  * property Spark's partial aggregation relies on.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genPos: Gen[Position] = for {
    s <- Arbitrary.arbitrary[Long]
    t <- Arbitrary.arbitrary[Long]
  } yield Position(s, t)

  test("Position ordering is a strict total order (unsigned semantics)") {
    check(Prop.forAll(genPos, genPos, genPos) { (a, b, c) =>
      val antisym = !(a.lessThan(b) && b.lessThan(a))
      val total = a == b || a.lessThan(b) || b.lessThan(a)
      val trans = !(a.lessThan(b) && b.lessThan(c)) || a.lessThan(c)
      antisym && total && trans
    })
  }

  test("unsigned ordering agrees with BigInt interpretation") {
    check(Prop.forAll(genPos, genPos) { (a, b) =>
      def big(x: Long) = BigInt(java.lang.Long.toUnsignedString(x))
      val expected = (big(a.step), big(a.txId)) < (big(b.step), big(b.txId))
      a.lessThan(b) == expected
    })
  }

  private val genChange: Gen[ChangeRecord] = for {
    step <- Gen.chooseNum(0L, 5L)
    tx <- Gen.chooseNum(0L, 3L)
    off <- Gen.chooseNum(0L, 100L)
    op <- Gen.oneOf(Op.Update, Op.Erase)
    nCols <- Gen.chooseNum(0, 3)
    cols <- Gen.mapOfN(nCols, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.alphaStr))
  } yield ChangeRecord(0, 0, off,
    Seq("k"), if (op == Op.Erase) Map.empty else cols, step, tx, op)

  test("LWW Aggregator is insensitive to fold order and split points") {
    val agg = new LwwMerge.LwwAggregator(0, Seq("k"))
    check(Prop.forAll(Gen.listOfN(8, genChange), Gen.chooseNum(0, 8),
      Gen.chooseNum(0L, 7L)) { (evs0, split, seed) =>
      // distinct offsets keep the order key unique, like source offsets
      val evs = evs0.zipWithIndex.map { case (c, i) => c.copy(offset = i.toLong) }
      val sequential = agg.finish(evs.foldLeft(agg.zero)(agg.reduce))
      val shuffled = new scala.util.Random(seed).shuffle(evs)
      val viaShuffle = agg.finish(shuffled.foldLeft(agg.zero)(agg.reduce))
      val (l, r) = shuffled.splitAt(split min shuffled.length)
      val viaMerge = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      sequential.op == viaShuffle.op && sequential.columns == viaShuffle.columns &&
        sequential.op == viaMerge.op && sequential.columns == viaMerge.columns
    })
  }

  test("LWW fold agrees with the sequential replay semantics") {
    val agg = new LwwMerge.LwwAggregator(0, Seq("k"))
    check(Prop.forAll(Gen.listOfN(8, genChange)) { evs0 =>
      val evs = evs0.zipWithIndex.map { case (c, i) => c.copy(offset = i.toLong) }
      // reference semantics: replay in merge order
      val ordered = evs.sortBy(c => (Position.ux(c.step), Position.ux(c.txId), c.offset))
      val expected = ordered.foldLeft((Op.Unknown, Map.empty[String, String])) {
        case ((_, acc), c) =>
          if (c.op == Op.Erase) (Op.Erase, Map.empty)
          else (Op.Update, acc ++ c.columns)
      }
      val got = agg.finish(evs.foldLeft(agg.zero)(agg.reduce))
      evs.isEmpty || (got.op == expected._1 && got.columns == expected._2)
    })
  }
}
