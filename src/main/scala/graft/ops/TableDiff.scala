package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the data
  * -versioning companion of the store's time travel
  * (`sink.TransactionalStore.readAt`): what changed between version
  * X and version Y, stated as one row per key.
  *
  * Scale shape: ONE full-outer join on the key columns. Both inputs
  * are snapshots of the same bucketed CoW table in the engine
  * composition, so the join co-partitions; `changed_cols` is a pure
  * projection (null-safe per-column compare), and rows equal in every
  * compared column can be filtered before any downstream exchange.
  */
object TableDiff {

  val Added = "added"
  val Removed = "removed"
  val Changed = "changed"
  val Unchanged = "unchanged"

  /** Diff `newer` against `older`. Returns one row per key present in
    * either side: (keys…, status, changed_cols) where status is
    * added (key only in `newer`), removed (only in `older`), changed
    * (present in both, any compare column differs under null-safe
    * equality), or unchanged; `changed_cols` lists the differing
    * column names in `compareCols` order (empty unless changed).
    */
  def diff(older: DataFrame, newer: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    val a = older.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_a", lit(true))
      .select(keys.map(col) ++
        compareCols.map(c => col(c).as(s"__a_$c")) :+ col("__in_a"): _*)
    val b = newer.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(true))
      .select(keys.map(col) ++
        compareCols.map(c => col(c).as(s"__b_$c")) :+ col("__in_b"): _*)
    val changedCols: Column = filter(
      array(compareCols.map(c =>
        when(!(col(s"__a_$c") <=> col(s"__b_$c")), lit(c))): _*),
      x => x.isNotNull)
    a.join(b, keys, "full_outer")
      .withColumn("status",
        when(col("__in_a").isNull, lit(Added))
          .when(col("__in_b").isNull, lit(Removed))
          .when(size(changedCols) > 0, lit(Changed))
          .otherwise(lit(Unchanged)))
      .withColumn("changed_cols",
        when(col("status") === Changed, changedCols)
          .otherwise(array().cast("array<string>")))
      .select(keys.map(col) :+ col("status") :+ col("changed_cols"): _*)
  }
}
