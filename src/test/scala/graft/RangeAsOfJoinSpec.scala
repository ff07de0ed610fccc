package graft

import graft.ops.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** RangeJoin / AsOfJoin: equivalence against their brute-force
  * nested-loop twins on randomized inputs, boundary semantics, and
  * the plan properties that make them the scalable shape (bin
  * equi-join instead of BroadcastNestedLoopJoin; one exchange for the
  * as-of union+window).
  */
class RangeAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().toSeq
      .map(r => (0 until r.length).map(r.get))
      .sortBy(_.mkString("|"))
  }

  private val pointsGen = Gen.listOfN(60,
    Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 1000L)))
  private val intervalsGen = Gen.listOfN(25,
    Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 950L), Gen.choose(0L, 120L)))

  test("pointInInterval equals the brute nested-loop twin (randomized, keyed)") {
    check(Prop.forAll(pointsGen, intervalsGen) { (ps, ivs) =>
      val points = ps.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("pid", "k", "t")
      val intervals = ivs.zipWithIndex
        .map { case ((k, lo, len), i) => (1000L + i, k, lo, lo + len) }
        .toDF("iid", "k", "lo", "hi")
      val fast = RangeJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", binWidth = 64L, keys = Seq("k"))
      val brute = RangeJoin.pointInIntervalBrute(points, intervals,
        "t", "lo", "hi", keys = Seq("k"))
      sortedRows(fast) == sortedRows(brute)
    })
  }

  test("pointInInterval is inclusive at both interval ends") {
    val points = Seq((1L, 0L, 99L), (2L, 0L, 100L), (3L, 0L, 200L),
      (4L, 0L, 201L)).toDF("pid", "k", "t")
    val intervals = Seq((9L, 0L, 100L, 200L)).toDF("iid", "k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", binWidth = 7L, keys = Seq("k"))
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 3L))
  }

  test("pointInInterval plans a bin equi-join, never a nested loop") {
    val points = (0L until 100L).map(i => (i, i % 3, i * 10)).toDF("pid", "k", "t")
    val intervals = (0L until 20L).map(i => (i, i % 3, i * 40, i * 40 + 100))
      .toDF("iid", "k", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", binWidth = 100L, keys = Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in plan:\n$plan")
  }

  test("intervalOverlap equals the brute twin and emits each pair once") {
    check(Prop.forAll(intervalsGen, intervalsGen) { (as, bs) =>
      val a = as.zipWithIndex
        .map { case ((k, lo, len), i) => (i.toLong, k, lo, lo + len) }
        .toDF("aid", "k", "alo", "ahi")
      val b = bs.zipWithIndex
        .map { case ((k, lo, len), i) => (100L + i, k, lo, lo + len) }
        .toDF("bid", "k", "blo", "bhi")
      val fast = RangeJoin.intervalOverlap(a, b,
        "alo", "ahi", "blo", "bhi", binWidth = 64L, keys = Seq("k"))
      val brute = RangeJoin.intervalOverlapBrute(a, b,
        "alo", "ahi", "blo", "bhi", keys = Seq("k"))
      // exact multiset equality: a pair surviving in two bins would
      // show up here as a duplicate row fast has and brute lacks
      sortedRows(fast) == sortedRows(brute)
    })
  }

  test("intervalOverlap touches at a single shared point and stays keyed") {
    val a = Seq((1L, 0L, 10L, 20L), (2L, 0L, 30L, 40L), (3L, 1L, 10L, 20L))
      .toDF("aid", "k", "alo", "ahi")
    val b = Seq((9L, 0L, 20L, 25L), (8L, 0L, 41L, 50L)).toDF("bid", "k", "blo", "bhi")
    val got = RangeJoin.intervalOverlap(a, b, "alo", "ahi", "blo", "bhi",
        binWidth = 7L, keys = Seq("k"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // touching endpoints (20,20) overlap; (2) misses (40 < 41); key 1 never joins key 0
    assert(got == Seq((1L, 9L)))
  }

  private val rightGen = Gen.listOfN(30,
    Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 500L), Gen.choose(-50, 50)))
  private val leftGen = Gen.listOfN(40,
    Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 520L)))

  test("backward as-of equals the brute inequality-join twin (randomized)") {
    check(Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      // unique (k, rt): keep max v per key-time like the query does
      val right = rs.map { case (k, rt, v) => (k, rt, v.toLong) }
        .toDF("k", "rt", "v")
        .groupBy("k", "rt").agg(max("v").as("v"))
      val fast = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      val brute = AsOfJoin.backwardBrute(left, right, Seq("k"), "t", "rt", Seq("v"))
      sortedRows(fast) == sortedRows(brute)
    })
  }

  test("backward as-of ties resolve to <= and unmatched lefts stay null") {
    val left = Seq((1L, 0L, 100L), (2L, 0L, 99L), (3L, 7L, 100L))
      .toDF("lid", "k", "t")
    val right = Seq((0L, 100L, 5L), (0L, 90L, 4L)).toDF("k", "rt", "v")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(1L -> Some(5L), 2L -> Some(4L), 3L -> None))
  }

  test("forward as-of equals an independent inequality-join argmin (randomized)") {
    check(Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val right = rs.map { case (k, rt, v) => (k, rt, v.toLong) }
        .toDF("k", "rt", "v")
        .groupBy("k", "rt").agg(max("v").as("v"))
      val fast = AsOfJoin.forward(left, right, Seq("k"), "t", "rt", Seq("v"))
      // independent brute: min (rt, v) struct over rt >= t matches
      val lk = left.withColumnRenamed("k", "lk").withColumnRenamed("t", "lt")
      val brute = lk.join(right,
          lk("lk") === right("k") && right("rt") >= lk("lt"), "left")
        .groupBy("lid")
        .agg(first("lk").as("k"), first("lt").as("t"),
          min(struct(col("rt"), col("v"))).as("__best"))
        .select(col("lid"), col("k"), col("t"),
          col("__best.v").as("asof_v"))
      sortedRows(fast) == sortedRows(brute)
    })
  }

  test("as-of tolerance voids stale matches, backward and forward") {
    val left = Seq((1L, 0L, 100L), (2L, 0L, 200L)).toDF("lid", "k", "t")
    val right = Seq((0L, 95L, 7L)).toDF("k", "rt", "v")
    val bw = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"),
        tolerance = Some(10L))
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // t=100: 100-95=5 <= 10 matches; t=200: 105 > 10 voided
    assert(bw == Map(1L -> Some(7L), 2L -> None))
    val left2 = Seq((1L, 0L, 90L), (2L, 0L, 50L)).toDF("lid", "k", "t")
    val fw = AsOfJoin.forward(left2, right, Seq("k"), "t", "rt", Seq("v"),
        tolerance = Some(10L))
      .select("lid", "asof_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // t=90: 95-90=5 <= 10 matches; t=50: 45 > 10 voided
    assert(fw == Map(1L -> Some(7L), 2L -> None))
  }

  test("backward as-of shuffles once (union+window, no join exchange pair)") {
    val left = (0L until 200L).map(i => (i, i % 5, i * 3)).toDF("lid", "k", "t")
    val right = (0L until 100L).map(i => (i % 5, i * 7, i)).toDF("k", "rt", "v")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"join operator in what should be a union+window plan:\n$plan")
  }
}
