package graft

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The unsplittable-input scan spread (Tables.maybeSpread, r17
  * optimization): a single-row-group parquet table must load with
  * defaultParallelism partitions (instead of the one non-empty split
  * the row-group layout would give every fused scan stage), the
  * spread must be conf-disableable, must leave rows identical, and
  * must NOT fire when the file set already offers enough row groups.
  */
class ScanSpreadSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("single-row-group table spreads proportionally, capped at " +
      "defaultParallelism") {
    // r18: width = ceil(uncompressedBytes / spreadTargetBytes), so a
    // mid-sized table spreads without the r17 flat 32-way fan-out
    // (sf0.01 lineitem is ~1.2MB uncompressed: several partitions)
    val df = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val n = df.rdd.getNumPartitions
    assert(n > 1 && n <= spark.sparkContext.defaultParallelism, s"n=$n")
  }

  test("trivially small table is not spread at all") {
    val df = Tables.load(spark, sfDir, "supplier")
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("Repartition"))
  }

  test("spreadTargetBytes=0 restores the flat-to-parallelism width") {
    spark.conf.set(Tables.SpreadTargetBytesKey, "0")
    try {
      val df = Tables.load(spark, sfDir, "documents")
      assert(df.rdd.getNumPartitions ===
        spark.sparkContext.defaultParallelism)
    } finally spark.conf.unset(Tables.SpreadTargetBytesKey)
  }

  test("spread off under spreadMaxBytes=0, rows identical either way") {
    val on = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source").orderBy("doc_id").collect().toSeq
    spark.conf.set(Tables.SpreadMaxBytesKey, "0")
    try {
      val raw = Tables.load(spark, sfDir, "documents")
      // no Repartition node: the scan's own partitioning survives
      assert(!raw.queryExecution.optimizedPlan.toString
        .contains("Repartition"))
      val off = raw.select("doc_id", "source").orderBy("doc_id")
        .collect().toSeq
      assert(on === off)
    } finally spark.conf.unset(Tables.SpreadMaxBytesKey)
  }

  test("multi-row-group input at/above parallelism is left alone") {
    // write a table with >= defaultParallelism row groups, then load
    // through the same census path via a sibling-named parquet dir
    val root = java.nio.file.Files.createTempDirectory("spread-spec")
    val dir = root.toString
    val n = spark.sparkContext.defaultParallelism
    spark.range(1000).repartition(n * 2)
      .write.parquet(s"$dir/many.parquet")
    val df = Tables.load(spark, dir, "many")
    assert(!df.queryExecution.optimizedPlan.toString
      .contains("Repartition"))
    assert(df.count() === 1000L)
  }

  test("filter still pushes to the scan through the spread") {
    // sf0.01 so the spread actually fires (sf0.001 tables are under
    // one spread-target of uncompressed bytes)
    val df = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .filter(col("l_quantity") > 49)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,49"), plan.linesIterator.take(25).mkString("\n"))
  }
}
