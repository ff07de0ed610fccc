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

  // ---- TopKBuffer (the graft_topk aggregate's state) ----

  // negation-free oracle order: sortBy(-ord) would itself break at
  // ord = Long.MinValue, the exact case the buffer's comparator fix
  // exists for
  private def topkOf(es: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    es.distinct.sorted(graft.functions.TopKBuffer.bestFirst).take(k)
  // the heap keeps duplicates it saw separately only if they tie by
  // both fields; compare as SETS of the sorted prefix: for equality
  // feed distinct entries below
  private def bufEntries(b: graft.functions.TopKBuffer): Seq[(Long, Long)] =
    b.heap.toArray.toSeq.sorted(graft.functions.TopKBuffer.bestFirst)

  test("TopKBuffer.bestFirst orders without negation overflow") {
    val o = graft.functions.TopKBuffer.bestFirst
    // Long.MinValue must rank as the SMALLEST ord (last), not flip to
    // maximal through -MinValue == MinValue
    assert(o.compare((Long.MinValue, 0L), (0L, 0L)) > 0)
    assert(o.compare((Long.MaxValue, 0L), (Long.MinValue, 0L)) < 0)
    assert(o.compare((5L, 1L), (5L, 2L)) < 0) // tie: smaller id first
    val b = new graft.functions.TopKBuffer(2)
    b.add(Long.MinValue, 7L); b.add(0L, 1L); b.add(Long.MaxValue, 2L)
    assert(bufEntries(b) == Seq((Long.MaxValue, 2L), (0L, 1L)))
  }

  test("TopKBuffer equals sort-take under any insertion order / split") {
    val genE = for {
      o <- Gen.oneOf(Gen.chooseNum(-50L, 50L),
        Gen.oneOf(Long.MinValue, Long.MinValue + 1, Long.MaxValue))
      i <- Gen.chooseNum(0L, 30L)
    } yield (o, i)
    check(Prop.forAll(Gen.listOf(genE), Gen.chooseNum(1, 8),
        Gen.chooseNum(0, 40)) { (es0, k, cut0) =>
      val es = es0.distinct // duplicate (ord,id) pairs are one entry
      val direct = new graft.functions.TopKBuffer(k)
      es.foreach(e => direct.add(e._1, e._2))
      // merge path: split at an arbitrary point, fill two buffers,
      // merge — must equal the single-buffer fold (what Spark's
      // partial aggregation relies on)
      val cut = if (es.isEmpty) 0 else cut0 % (es.length + 1)
      val (l, r) = es.splitAt(cut)
      val a = new graft.functions.TopKBuffer(k)
      val b = new graft.functions.TopKBuffer(k)
      l.foreach(e => a.add(e._1, e._2))
      r.foreach(e => b.add(e._1, e._2))
      b.heap.foreach(e => a.add(e._1, e._2))
      val want = topkOf(es, k)
      bufEntries(direct) == want && bufEntries(a) == want
    })
  }

  test("TopKPairsAgg serialize/deserialize roundtrips the state") {
    val agg = graft.functions.TopKPairsAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 5)
    val genE = for {
      o <- Arbitrary.arbitrary[Long]
      i <- Arbitrary.arbitrary[Long]
    } yield (o, i)
    check(Prop.forAll(Gen.listOf(genE)) { es =>
      val b = new graft.functions.TopKBuffer(5)
      es.distinct.foreach(e => b.add(e._1, e._2))
      val back = agg.deserialize(agg.serialize(b))
      back.k == b.k && bufEntries(back) == bufEntries(b)
    })
  }
}
