package graft

import graft.ops.Preference
import org.apache.spark.sql.functions._

/** Preference: pair derivation from event streams and the
  * Bradley-Terry MM fixed point's closed-form identities.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDF(rows: (String, String, Long, Long)*) =
    rows.toDF("item_a", "item_b", "wins_a", "wins_b")

  private def thetas(rows: (String, String, Long, Long)*) =
    Preference.bradleyTerry(spark, pairsDF(rows: _*), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap

  test("two items: theta ratio matches the closed-form wa/wb") {
    // BT MLE for two items: θa/θb = wa/wb; normalized to Σθ = 2e6
    val th = thetas(("a", "b", 30L, 10L))
    assert(math.abs(th("a") - 1500000L) <= 2L)
    assert(math.abs(th("b") - 500000L) <= 2L)
  }

  test("symmetric records give equal strengths") {
    val th = thetas(("a", "b", 7L, 7L), ("a", "c", 5L, 5L),
      ("b", "c", 9L, 9L))
    assert(th("a") == th("b") && th("b") == th("c"))
  }

  test("a dominant item ranks first; a winless item floors at 1") {
    val got = Preference.bradleyTerry(spark,
      pairsDF(("a", "b", 20L, 0L), ("a", "c", 20L, 5L),
        ("b", "c", 0L, 10L)), iters = 10)
      .orderBy("rk").collect()
    assert(got(0).getString(0) == "a")
    val b = got.find(_.getString(0) == "b").get
    assert(b.getLong(1) == 0L && b.getLong(3) == 1L) // winless → floor
    // games column: total comparisons touching the item
    assert(got(0).getLong(2) == 45L)
  }

  test("the MM iteration contracts to its fixed point") {
    val pairs = Seq(("a", "b", 13L, 4L), ("a", "c", 2L, 9L),
      ("b", "c", 6L, 6L), ("a", "d", 1L, 1L))
    def at(iters: Int) =
      Preference.bradleyTerry(spark, pairsDF(pairs: _*), iters)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    def delta(x: Map[String, Long], y: Map[String, Long]) =
      x.map { case (i, t) => math.abs(t - y(i)) }.max
    val (t1, t2, t9, t10, t29, t30) =
      (at(1), at(2), at(9), at(10), at(29), at(30))
    // geometric contraction: successive deltas shrink by >5× over the
    // first ten rounds, and by round 30 the e6 fixed point is exact
    assert(delta(t10, t9) * 5L < delta(t2, t1))
    assert(delta(t30, t29) <= 1L)
  }

  test("bradleyTerryDistributed replays the driver trajectory " +
      "bit-identically (randomized domains)") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val nItems = 4 + rnd.nextInt(12)
      val items = (0 until nItems).map(i => f"it$i%02d")
      val rows = for {
        a <- items.indices; b <- (a + 1) until nItems
        if rnd.nextInt(3) > 0 // leave some pairs uncompared
      } yield (items(a), items(b),
        rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      val nonEmpty = rows.filter(r => r._3 + r._4 > 0)
      if (nonEmpty.nonEmpty) {
        val iters = 1 + rnd.nextInt(6)
        val want = Preference.bradleyTerry(spark, pairsDF(nonEmpty: _*),
          iters).collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        val got = Preference.bradleyTerryDistributed(pairsDF(nonEmpty: _*),
          iters).collect().map(r => (r.getString(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
        assert(got == want, s"trial=$trial iters=$iters")
      }
    }
  }

  test("bradleyTerryDistributed: a winless item floors at theta 1") {
    val got = Preference.bradleyTerryDistributed(
      pairsDF(("a", "b", 30L, 0L), ("b", "c", 0L, 5L)), iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("b") == 1L)
    assert(got("a") > got("b") && got("c") > got("b"))
  }

  test("the driver path refuses an item domain past its ceiling; " +
      "auto routes it to the distributed path") {
    // tiny threshold via the auto router's parameter — the contract
    // under test is routing, not scale
    val p = pairsDF(("a", "b", 2L, 1L), ("b", "c", 3L, 1L),
      ("a", "c", 1L, 1L))
    val viaAuto = Preference.bradleyTerryAuto(spark, p, iters = 3,
      driverMaxItems = 2)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val direct = Preference.bradleyTerryDistributed(p, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(viaAuto == direct)
    // the ceiling itself is a loud require on the driver path
    val wide = (0 until Preference.DriverMaxItems + 1).map(i =>
      (f"x$i%05d", "zz", 1L, 1L))
    val e = intercept[IllegalArgumentException] {
      Preference.bradleyTerry(spark, pairsDF(wide: _*), iters = 1)
    }
    assert(e.getMessage.contains("ceiling"))
  }

  test("pairwiseFromEvents plan: one data-sized shuffle (the user " +
      "window), one post-partial-agg pair exchange") {
    val ev = Seq.tabulate(64)(i =>
      (i.toLong % 8L, i.toLong, i.toLong, s"t${i % 3}", (i % 7).toDouble))
      .toDF("user_id", "event_id", "t_us", "event_type", "value")
    val plan = Preference.pairwiseFromEvents(ev, col("t_us"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly the user-window + pair-agg exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"nothing may funnel through one partition:\n$plan")
  }

  test("pairwiseFromEvents: consecutive same-user events with " +
      "distinct types and values form one canonical game") {
    val ev = Seq(
      // user 1: A(1.0) -> B(2.0) -> B(3.0) -> C(1.5) -> C(1.5)... last
      // C vs C dropped (same type); B vs B dropped too
      (1L, 1L, 1L, "A", 1.0), (1L, 2L, 2L, "B", 2.0),
      (1L, 3L, 3L, "B", 3.0), (1L, 4L, 4L, "C", 1.5),
      // user 2: C(5.0) -> A(5.0) dropped (equal values), A -> B(7.0)
      (2L, 5L, 1L, "C", 5.0), (2L, 6L, 2L, "A", 5.0),
      (2L, 7L, 3L, "B", 7.0))
      .toDF("user_id", "event_id", "t_us", "event_type", "value")
    val got = Preference.pairwiseFromEvents(ev, col("t_us"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // user 1: A<B game won by B; B<C game won by B (3.0 > 1.5)
    // user 2: A<B game won by B (7.0 > 5.0)
    assert(got(("A", "B")) == ((0L, 2L)))
    assert(got(("B", "C")) == ((1L, 0L)))
    assert(got.size == 2)
  }
}
