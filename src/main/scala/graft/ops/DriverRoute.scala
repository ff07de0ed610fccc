package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared return seam for the driver-computed routes (union-find CC,
  * PageRank replay, MMR greedy walk, Bradley-Terry): turn a
  * driver-held row batch back into a DataFrame.
  *
  * The r17 routes always went through `parallelize(...)`, which plans
  * as an `ExistingRDD` with UNKNOWN statistics — so every downstream
  * join against a driver-route result (components → canonical picks,
  * ranks → suspect assembly) was a SortMergeJoin with an Exchange on
  * BOTH sides, even for a 20-row result. Returning a LOCAL relation
  * instead (`createDataFrame(list, schema)`) gives the planner exact
  * size statistics, so small results broadcast automatically and the
  * consumer side loses its exchanges (guide §3.1: pick the join
  * strategy deliberately — here by giving the planner real stats
  * rather than hints).
  *
  * Gated by row count: a result above [[LocalRelationMaxRows]] rows
  * keeps the r17 `parallelize` shape (a LocalRelation embeds its rows
  * in the logical plan — fine for the thousands-of-rows results these
  * routes produce, wrong for multi-million-row ones). The rows are
  * identical on both shapes; only plan statistics differ.
  */
object DriverRoute {

  /** Above this many rows, fall back to an RDD-backed frame. 64k rows
    * of id/long columns is well under a MB of plan payload — and any
    * driver-route result is already bounded by the route's own
    * collect gate, so this is a plan-size guard, not a memory one.
    */
  val LocalRelationMaxRows = 65536

  def frameOf(spark: SparkSession, rows: Seq[Row],
      schema: StructType): DataFrame =
    if (rows.lengthCompare(LocalRelationMaxRows) <= 0) {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, schema)
    } else {
      val parts = math.max(1, math.min(
        spark.sparkContext.defaultParallelism, rows.length / 25000 + 1))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, parts),
        schema)
    }
}
