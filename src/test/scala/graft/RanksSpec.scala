package graft

import graft.ops.{PipelineOps, Ranks}
import org.apache.spark.sql.functions._

/** Ranks.globalRowNumber — the two-level global rank — pinned against
  * the sorted-index definition, plus the plan contract that motivates
  * it: NO single-partition exchange anywhere (the thing a bare
  * `row_number() OVER (ORDER BY ...)` always creates), and the
  * topFractionByWeight integration under the adversarial all-tied
  * weight column that used to funnel the corpus through one window.
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals the sorted-index definition (asc)") {
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((0L until 997L).toList)
    val got = Ranks.globalRowNumber(ids.toDF("id"), Seq(col("id")), "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.sorted.zipWithIndex.foreach { case (id, i) =>
      assert(got(id) == i + 1L, s"id=$id")
    }
  }

  test("globalRowNumber: composite desc/asc order") {
    val rows = (0L until 200L).map(i => (i, i % 7L))
    val got = Ranks.globalRowNumber(rows.toDF("id", "w"),
      Seq(col("w").desc, col("id")), "rk")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.sortBy { case (id, w) => (-w, id) }.zipWithIndex.foreach {
      case ((id, _), i) => assert(got(id) == i + 1L, s"id=$id")
    }
  }

  test("plan: per-partition windows, no single-partition exchange") {
    val df = (0L until 500L).toDF("id")
    val plan = Ranks.rankedOver(Ranks.stamped(df, Seq(col("id"))),
      Seq(col("id")), "rk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"single-partition exchange in:\n$plan")
    assert(plan.contains("hashpartitioning(__gr_pid"),
      s"expected the per-partition window exchange in:\n$plan")
  }

  test("topFractionByWeight: all-tied weights select the smallest ids " +
      "on BOTH tie-rank routes") {
    // every row at w*: the ENTIRE input is the tie group. The descent
    // knows the group's exact size, so it routes: the default limit
    // takes the bounded window, tieWindowLimit = 0 forces the
    // two-level parallel rank — identical selections required.
    val rows = (0L until 1000L).map(i => (i, 42L))
    for (limit <- Seq(65536L, 0L)) {
      val got = PipelineOps.topFractionByWeight(
        rows.toDF("id", "w"), "id", "w", 1L, 4L,
        tieWindowLimit = limit)
        .filter(col("selected")).select("id").as[Long].collect().toSet
      assert(got == (0L until 250L).toSet, s"limit=$limit")
    }
  }

  test("topFractionByWeight: null weights fail loudly") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(1L)))
      .toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      PipelineOps.topFractionByWeight(df, "id", "w", 1L, 2L).collect()
    }
    assert(e.getMessage.contains("null"))
  }
}
