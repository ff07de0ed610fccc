package graft

import graft.ops.PipelineOps
import org.apache.spark.sql.functions._

/** Waterfilling budget allocation: the closed-form capped-prefix
  * rule, exact-integer conservation, largest-remainder distribution,
  * the all-capped branch, and loud input guards — plus a randomized
  * invariant sweep against the waterline optimality conditions.
  */
class BudgetAllocateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], budget: Long) =
    PipelineOps.budgetAllocate(rows.toDF("s", "w", "c"),
        col("s"), col("w"), col("c"), budget)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))

  test("worked example: one capped stratum, exact conservation") {
    val out = run(Seq(("a", 100L, 30L), ("b", 100L, 100L),
      ("c", 200L, 300L)), 300L)
    assert(out.toSeq == Seq(("a", 30L, true), ("b", 90L, false),
      ("c", 180L, false)))
  }

  test("largest-remainder: ties break by stratum, sum is exact") {
    // equal weights, indivisible budget: 10 over 3 → 4/3/3, the +1
    // to the lexicographically first stratum
    val out = run(Seq(("a", 3L, 100L), ("b", 3L, 100L),
      ("c", 3L, 100L)), 10L)
    assert(out.toSeq == Seq(("a", 4L, false), ("b", 3L, false),
      ("c", 3L, false)))
  }

  test("caps absorb the budget: everyone capped, surplus unspent") {
    val out = run(Seq(("a", 10L, 5L), ("b", 20L, 7L)), 100L)
    assert(out.toSeq == Seq(("a", 5L, true), ("b", 7L, true)))
  }

  test("zero cap allocates zero; zero budget allocates zero") {
    val out = run(Seq(("a", 10L, 0L), ("b", 10L, 50L)), 20L)
    assert(out.toSeq == Seq(("a", 0L, true), ("b", 20L, false)))
    val z = run(Seq(("a", 10L, 5L), ("b", 10L, 5L)), 0L)
    assert(z.map(_._2).sum == 0L)
  }

  test("loud guards: non-positive weight, negative cap, bad budget") {
    intercept[Exception] { run(Seq(("a", 0L, 5L)), 10L) }
    intercept[Exception] { run(Seq(("a", 5L, -1L)), 10L) }
    intercept[IllegalArgumentException] {
      PipelineOps.budgetAllocate(Seq(("a", 1L, 1L)).toDF("s", "w", "c"),
        col("s"), col("w"), col("c"), -1L)
    }
  }

  test("randomized waterline invariants") {
    val rnd = new scala.util.Random(414L)
    for (_ <- 1 to 30) {
      val n = 2 + rnd.nextInt(7)
      val rows = (0 until n).map(i => (f"s$i%02d",
        1L + rnd.nextInt(50), rnd.nextInt(80).toLong))
      val budget = rnd.nextInt(300).toLong
      val out = run(rows, budget)
      val byS = rows.map(r => r._1 -> r).toMap
      val cSum = rows.map(_._3).sum
      // conservation: exactly min(budget, Σcap) spent
      assert(out.map(_._2).sum == math.min(budget, cSum),
        s"conservation failed for $rows budget=$budget: ${out.toSeq}")
      // bounds + flag consistency
      out.foreach { case (s, a, capped) =>
        assert(a >= 0L && a <= byS(s)._3)
        if (capped) assert(a == byS(s)._3)
      }
      // waterline optimality (within integer rounding): every capped
      // stratum's ratio sits at or below every uncapped stratum's
      // post-allocation rate
      val unc = out.filter(!_._3)
      val cap = out.filter(_._3)
      for ((cs, ca, _) <- cap; (us, ua, _) <- unc) {
        val (wc, wu) = (byS(cs)._2, byS(us)._2)
        assert(ca * wu <= (ua + 1L) * wc,
          s"capped $cs above waterline of $us in $rows budget=$budget")
      }
      // uncapped rates agree within rounding
      for ((s1, a1, _) <- unc; (s2, a2, _) <- unc) {
        val (w1, w2) = (byS(s1)._2, byS(s2)._2)
        assert(math.abs(a1 * w2 - a2 * w1) <= w1 + w2,
          s"uneven water between $s1 and $s2 in $rows budget=$budget")
      }
    }
  }

  test("extreme magnitudes: ratios tied beyond double precision " +
      "still place the capped prefix exactly (r14 advice)") {
    // x's and y's cap/w ratios differ by 1/(a(a−1)) ≈ 1.1e−19 —
    // indistinguishable under a double division (eps ≈ 2.2e−16), so
    // the old float sort collapsed them to the name tiebreak; the
    // cross-multiplied rank orders them exactly. Expected values
    // hand-derived from the exact waterline (see the capped-prefix
    // telescoping in PipelineOps.budgetAllocate's Scaladoc).
    val a = 3037000500L
    val out = run(Seq(
      ("x", a, a + 1L), ("y", a - 1L, a), ("z", 10L * a, 100L * a)),
      12L * a + 11L)
    assert(out.toSeq == Seq(
      ("x", a + 1L, true), ("y", a, false), ("z", 10L * a + 10L, false)),
      s"got ${out.toSeq}")
  }

  test("doc_crawl_frontier composition conserves its budget: " +
      "sum(alloc) == sum(cap) div 2 exactly") {
    val rows = SparkEntry.queries("doc_crawl_frontier")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "frontier must emit a fetch plan")
    val capSum = rows.map(_.getAs[Long]("n_urls")).sum
    val allocSum = rows.map(_.getAs[Long]("alloc")).sum
    assert(allocSum == capSum / 2L,
      s"sum(alloc)=$allocSum != sum(cap)/2=${capSum / 2L}")
    rows.foreach { r =>
      val (c, al, capped) = (r.getAs[Long]("n_urls"),
        r.getAs[Long]("alloc"), r.getAs[Boolean]("capped"))
      assert(al >= 0L && al <= c)
      if (capped) assert(al == c)
    }
  }

  test("doc_crawl_frontier_paced: politeness binds before priority " +
      "(alloc <= paced_cap <= n_urls; conservation over PACED caps)") {
    val rows = SparkEntry.queries("doc_crawl_frontier_paced")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "paced frontier must emit a fetch plan")
    val pacedSum = rows.map(_.getAs[Long]("paced_cap")).sum
    val allocSum = rows.map(_.getAs[Long]("alloc")).sum
    assert(allocSum == pacedSum / 2L,
      s"sum(alloc)=$allocSum != sum(paced_cap)/2=${pacedSum / 2L}")
    rows.foreach { r =>
      val (n, p, al, dl) = (r.getAs[Long]("n_urls"),
        r.getAs[Long]("paced_cap"), r.getAs[Long]("alloc"),
        r.getAs[Long]("delay_s"))
      assert(dl >= 1L, "the default delay is 1 s, parsed are positive")
      assert(p <= n, "pacing can only SHRINK capacity")
      assert(p >= math.min(n, 1L), "a live host keeps >= 1 fetch")
      assert(al >= 0L && al <= p, "allocation within the paced cap")
      if (r.getAs[Boolean]("capped")) assert(al == p)
    }
    // the fixture's delay classes must BOTH be present, and the 5 s
    // window must bind on at least one delay-5 host — otherwise the
    // query degenerates to the unpaced frontier and tests nothing
    val delays = rows.map(_.getAs[Long]("delay_s")).toSet
    assert(delays == Set(1L, 5L), s"expected both delay classes: $delays")
    assert(rows.exists(r => r.getAs[Long]("paced_cap") <
      r.getAs[Long]("n_urls")), "pacing must bind somewhere")
  }
}
