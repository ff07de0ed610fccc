package graft

import graft.ops.Ranks
import graft.plans.PlanLint
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanLint: the structural smells fire where they should and stay
  * quiet on the shapes this library promotes.
  */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  test("a bare global window is flagged as a single-partition exchange") {
    val df = (1L to 100L).toDF("id")
      .withColumn("rk", row_number().over(Window.orderBy(col("id"))))
    val kinds = PlanLint.audit(df).map(_.kind)
    assert(kinds.contains("single-partition-exchange"), kinds.toString)
  }

  test("a global aggregate's partial exchange is NOT flagged") {
    val df = (1L to 100L).toDF("id").agg(sum("id"), count(lit(1)))
    assert(PlanLint.audit(df).isEmpty)
  }

  test("a cross join is flagged; an equi-join is not") {
    val a = (1L to 20L).toDF("id")
    val b = (1L to 20L).toDF("id2")
    val cross = PlanLint.audit(a.crossJoin(b)).map(_.kind).toSet
    assert(cross.contains("cartesian-product") ||
      cross.contains("nested-loop-join"), cross.toString)
    val equi = a.join(b.withColumnRenamed("id2", "id"), "id")
    assert(!PlanLint.audit(equi).exists(f =>
      f.kind == "cartesian-product" || f.kind == "nested-loop-join"))
  }

  test("the two-level rank dogfoods clean") {
    val df = (1L to 500L).toDF("id")
    val ranked = Ranks.rankedOver(Ranks.stamped(df, Seq(col("id"))),
      Seq(col("id")), "rk")
    assert(PlanLint.audit(ranked).isEmpty,
      PlanLint.audit(ranked).toString)
  }

  test("scanReport surfaces pushed filters and the pruned read schema") {
    val dir = java.nio.file.Files.createTempDirectory("lintscan").toString
    (1L to 100L).map(i => (i, s"v$i", i % 7))
      .toDF("id", "v", "m").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("id") > 50L).select("id", "m")
    val scans = PlanLint.scanReport(df)
    assert(scans.length == 1)
    assert(scans.head.pushedFilters.contains("GreaterThan(id,50)"),
      scans.head.toString)
    // column pruning: the unused string column never reaches the scan
    assert(!scans.head.readSchema.contains("v"), scans.head.toString)
  }
}
