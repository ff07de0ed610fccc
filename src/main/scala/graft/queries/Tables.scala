package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table access + the shared events→CDC mapping used by the
  * operator-analog queries.
  *
  * The oracle contract: every query here has a DuckDB twin over the
  * same parquet files. Determinism rules shared by both sides:
  *  - event time is truncated to MICROSECONDS (`step_us`): Spark reads
  *    the ns column as a long (nanosAsLong), DuckDB truncates to µs on
  *    read — so both sides compare at µs;
  *  - double aggregation always goes through DECIMAL(18,6) (exact) and
  *    only the final value is cast back to double — identical bits on
  *    both engines regardless of summation order;
  *  - every output is fully ordered by a unique key.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Event time in µs: the ns long (nanosAsLong read) truncated to
    * µs. THE ns→µs mapping — every events-based query must use this
    * (and [[OracleDefs.EventStepUs]] on the SQL side) so the unit
    * cannot drift between engines.
    */
  def stepUs: org.apache.spark.sql.Column = expr("ts div 1000")

  /** The CDC-analog view of `events` (shared by all cdc_* queries):
    *  - elementary stream/partition  = user_id % 8
    *  - position (step, arrival)    = (µs timestamp, event_id)
    *  - operation                   = erase for 'error' events, else update
    *  - partial-update column mask  = click sets only `value`,
    *    view sets only `props`, other types set both
    * The same mapping is expressed in SQL by [[OracleDefs.cdcView]].
    */
  def cdcView(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("step_us", stepUs)
      .withColumn("part", pmod(col("user_id"), lit(8)))
      .withColumn("op", when(col("event_type") === "error", 1).otherwise(0))
      .withColumn("has_value",
        col("op") === 0 && col("event_type") =!= "view")
      .withColumn("has_props",
        col("op") === 0 && col("event_type") =!= "click")
}

/** SQL fragments shared by every oracle (kept beside the Spark
  * implementations so the two sides can't drift).
  */
object OracleDefs {
  /** DuckDB twin of [[Tables.stepUs]] (ns → µs event time). */
  val EventStepUs: String = "epoch_us(ts)"

  /** DuckDB twin of [[Tables.cdcView]]. */
  val cdcView: String =
    s"""cdc AS (
      |  SELECT event_id, $EventStepUs AS step_us, user_id,
      |         user_id % 8 AS part, event_type, value, props,
      |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS op,
      |         (event_type <> 'error' AND event_type <> 'view') AS has_value,
      |         (event_type <> 'error' AND event_type <> 'click') AS has_props
      |  FROM events)""".stripMargin

  /** Checkpoint literal for the filter queries: 2024-01-15T00:00:00Z
    * in µs — mid-range of the events table at every scale factor, so
    * the filter check is non-degenerate.
    */
  val CheckpointUs: Long = 1705276800000000L
}
