package graft

import graft.queries.Tables
import org.apache.spark.sql.functions._

/** The events.ts schema contract. The driver's events.parquet has
  * carried two physical shapes across rounds — TIMESTAMP(NANOS)
  * (surfaced as a ns long by the nanosAsLong conf) and timestamp[us]
  * (surfaced as TIMESTAMP_NTZ) — and a silent flip broke every
  * events-based query in the r7 bench. This spec pins that
  * [[Tables.stepUs]] and [[Tables.tsAfterUs]] produce IDENTICAL µs
  * values and filter sets for the same instants under both shapes, so
  * the next flip is a no-op instead of a board-wide red.
  */
class EventTimeSpec extends SparkSpec {
  import spark.implicits._

  // instants straddling OracleDefs.CheckpointUs (2024-01-15T00:00:00Z)
  private val instantsUs = Seq(
    1705276799999999L, // checkpoint - 1 µs
    1705276800000000L, // exactly the checkpoint
    1705276800000001L, // checkpoint + 1 µs
    1705300000123456L,
    1700000000000000L)

  private def longNsDf = instantsUs.zipWithIndex
    .map { case (us, i) => (i.toLong, us * 1000L) }
    .toDF("event_id", "ts")

  private def tsNtzDf = {
    val d = instantsUs.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
    d.select(col("event_id"),
      expr("cast(timestamp_micros(us) as timestamp_ntz)").as("ts"))
  }

  test("stepUs yields identical µs for ns-long and timestamp_ntz shapes") {
    val a = longNsDf.select($"event_id", Tables.stepUs(longNsDf).as("step_us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = tsNtzDf.select($"event_id", Tables.stepUs(tsNtzDf).as("step_us"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._2).toSeq == instantsUs)
  }

  test("tsAfterUs keeps the same rows under both shapes, strict at the boundary") {
    val cut = graft.queries.OracleDefs.CheckpointUs
    val a = longNsDf.filter(Tables.tsAfterUs(longNsDf, cut))
      .select("event_id").as[Long].collect().sorted.toSeq
    val b = tsNtzDf.filter(Tables.tsAfterUs(tsNtzDf, cut))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // strict >: the exact-checkpoint row (event_id 1) must be excluded
    assert(a == Seq(2L, 3L))
  }

  test("tsAfterUs is a raw-column predicate that reaches the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("evts").toString
    tsNtzDf.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val plan = onDisk.filter(Tables.tsAfterUs(onDisk,
      graft.queries.OracleDefs.CheckpointUs))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts"),
      s"expected a pushed GreaterThan(ts,…) in:\n$plan")
  }
}
