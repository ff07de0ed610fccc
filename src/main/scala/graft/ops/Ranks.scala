package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels
  * the whole input through one task — Spark itself warns ("Moving
  * all data to a single partition"), and at 100 TB that task is the
  * job. The two-level decomposition [[Eval]] uses for score prefix
  * sums generalizes to any orderable key: range-partition on the
  * order key, rank locally inside each partition (parallel windows),
  * and add per-partition offsets cumulated driver-side from the O(P)
  * partition counts.
  */
object Ranks {

  /** Appends `rankName` = the global 1-based row number of each row
    * under `order` (columns may carry `.desc`/`.asc`).
    *
    * Determinism contract: the caller guarantees `order` is a total,
    * duplicate-free order (the same contract a bare
    * `row_number() OVER (ORDER BY ...)` needs to be deterministic).
    *
    * Consistency: the range-partitioned input is pinned while the
    * O(P) counts collect and the ranked result materializes
    * eagerly ([[Materialize.cut]], deployment-routed), so
    * both levels price the SAME partitioning and the returned frame
    * owns its rows — releasing the pin cannot skew ranks, and
    * downstream actions never recompute `df`'s lineage.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      rankName: String): DataFrame = {
    val pinned = stamped(df, order)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try Materialize.cut(rankedOver(pinned, order, rankName))
    finally pinned.unpersist()
  }

  /** Range-partition on the order key and stamp each row with its
    * physical partition id — partition i's keys all precede partition
    * j's for i < j, so a local rank plus the count of earlier
    * partitions IS the global rank.
    */
  private[graft] def stamped(df: DataFrame, order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one order column")
    val parts =
      math.max(1, df.sparkSession.sessionState.conf.numShufflePartitions)
    df.repartitionByRange(parts, order: _*)
      .withColumn("__gr_pid", spark_partition_id())
  }

  /** The two-level rank over a [[stamped]] frame: O(P) per-partition
    * counts cumulate driver-side into offsets, local ranks run as
    * parallel per-partition windows, and a broadcast join glues them.
    * Package-visible so specs can assert the PLAN (no
    * single-partition exchange) before [[globalRowNumber]]'s eager
    * checkpoint hides it.
    */
  private[graft] def rankedOver(stamped: DataFrame, order: Seq[Column],
      rankName: String): DataFrame = {
    val spark = stamped.sparkSession
    val counts = stamped.groupBy("__gr_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = counts.map { case (pid, c) =>
      val o = acc; acc += c; Row(pid, o)
    }
    val offDf = spark.createDataFrame(
      java.util.Arrays.asList(offRows.toSeq: _*),
      StructType(Seq(
        StructField("__gr_pid", IntegerType, nullable = false),
        StructField("__gr_off", LongType, nullable = false))))
    val w = Window.partitionBy("__gr_pid").orderBy(order: _*)
    stamped.withColumn("__gr_lr", row_number().over(w).cast("long"))
      .join(broadcast(offDf), "__gr_pid")
      .withColumn(rankName, col("__gr_lr") + col("__gr_off"))
      .drop("__gr_pid", "__gr_lr", "__gr_off")
  }
}
