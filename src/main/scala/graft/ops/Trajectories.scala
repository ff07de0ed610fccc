package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Behavioral-trajectory export, bounded for 100 TB serving: each
  * user's first-k events in event-time order as aligned id/type
  * sequences (the shape a sequence model trains on), and the
  * shard-partitioned container form that makes the export a
  * RANGE-ADDRESSABLE artifact instead of a sorted DataFrame — a
  * training loader asks for users [lo, hi) and [[TarShards.readRange]]
  * opens exactly the shards whose name-encoded user range overlaps.
  *
  * Scale shape: the k-cap rides graft_topk's map-side partial combine
  * (the shuffle carries O(users × k), never an unbounded per-user
  * collect_list); the shard write is [[TarShards.write]]'s one hash
  * shuffle on the shard id. Sequences ship as comma-joined strings —
  * the scalar-output form the driver harness requires, and a
  * delimiter-free payload for the tar container.
  */
object Trajectories {

  /** First-`k`-events trajectory per user: (user_id, n_events, ids,
    * types) with ids/types as comma-joined strings aligned by
    * event-time order (`tsUs` ascending, event_id tiebreak).
    * `tsUs` must be the µs event-time column (schema-adaptive at the
    * call seam — see queries.Tables.stepUs); µs > 0, so the top-k
    * negation is overflow-safe.
    */
  def export(events: DataFrame, tsUs: Column, k: Int): DataFrame = {
    import graft.functions.TopKPairsAgg.topkPairs
    val e = events.select(col("user_id"), col("event_id"),
      col("event_type"), tsUs.as("t"))
    val picked = e.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        topkPairs(-col("t"), col("event_id"), k).as("top"))
      .select(col("user_id"), col("n_events"), posexplode(col("top")))
      .select(col("user_id"), col("n_events"),
        (col("pos") + 1).as("rn"), col("col.id").as("event_id"))
    picked.join(e.select(col("event_id"), col("event_type")), "event_id")
      .groupBy("user_id", "n_events")
      .agg(array_sort(collect_list(struct(col("rn"), col("event_id"),
        col("event_type")))).as("o"))
      .select(col("user_id"), col("n_events"),
        array_join(transform(col("o"),
          x => x("event_id").cast("string")), ",").as("ids"),
        array_join(transform(col("o"),
          x => x("event_type").cast("string")), ",").as("types"))
  }

  /** Payload codec shared by [[writeShards]] and [[readShardRange]]:
    * one text line `n_events<TAB>ids<TAB>types`. Tab-delimited is
    * unambiguous here — the two sequences are comma-joined and event
    * types are token-alphabet strings, so neither field can contain a
    * tab.
    */
  private val PayloadSep = "\t"

  /** Pack a trajectory frame (the [[export]] schema) into tar shards
    * keyed by user range: shard s holds users
    * [s·usersPerShard, (s+1)·usersPerShard). Returns the shard count.
    */
  def writeShards(traj: DataFrame, dir: String,
      usersPerShard: Long): Long = {
    val packed = traj.select(col("user_id"),
      concat_ws(PayloadSep, col("n_events").cast("string"),
        col("ids"), col("types")).as("payload"))
    TarShards.write(packed, "user_id", "payload", dir, usersPerShard,
      ext = "tsv")
  }

  /** Read users [loUser, hiUser) back from a shard set written by
    * [[writeShards]] — file pruning by shard name before any byte
    * opens, then the payload parses back to the [[export]] schema.
    */
  def readShardRange(spark: SparkSession, dir: String,
      usersPerShard: Long, loUser: Long, hiUser: Long): DataFrame =
    TarShards.readRange(spark, dir, usersPerShard, loUser, hiUser)
      .select(
        expr("CAST(substring(name, 1, 12) AS BIGINT)").as("user_id"),
        split(col("payload").cast("string"), PayloadSep).as("f"))
      .select(col("user_id"),
        element_at(col("f"), 1).cast("long").as("n_events"),
        element_at(col("f"), 2).as("ids"),
        element_at(col("f"), 3).as("types"))
}
