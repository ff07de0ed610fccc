package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operator surface beyond the CDC engine:
  * watermarked tumbling/sliding windows and custom session state via
  * flatMapGroupsWithState. The reference has no windowed aggregation
  * (its only time construct is the global quorum barrier), so these
  * are part of the pipeline-extension surface; they are also the
  * streaming forms of the batch-checked cdc_tumbling_window /
  * cdc_sessionize queries.
  */
object StreamOps {

  /** Watermarked tumbling-window count+sum over an event stream with
    * columns (ts timestamp, value double). Late data beyond
    * `watermark` is dropped by Spark's state eviction.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))

  /** Sliding-window variant. */
  def slidingCounts(events: DataFrame, watermark: String = "10 minutes",
      width: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup: keep the first arrival per key, with the
    * dedup state bounded by the watermark (a key older than the
    * watermark can be forgotten because any replica of it would be
    * dropped as late anyway). This is the streaming form of the batch
    * doc_exact_dedup — the state-store analog of the hash shuffle —
    * and the standard front gate of a continuously-ingesting corpus
    * pipeline.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermark: String, keyCols: String*): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  final case class SessionInput(userId: Long, tsUs: Long)
  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)
  final case class SessionOut(userId: Long, startUs: Long, endUs: Long,
      nEvents: Long)

  /** Gap-based sessionization with explicit state —
    * flatMapGroupsWithState keyed by user. A session closes when a
    * later event for the same key arrives beyond the gap (event-time
    * driven, deterministic; a production variant would add an
    * EventTimeTimeout to flush idle keys). The batch-checkable twin is
    * the cdc_sessionize oracle query.
    */
  def sessionize(events: Dataset[SessionInput], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessionInput],
            state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.tsUs)
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsUs - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = e.tsUs, nEvents = s.nEvents + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.startUs, s.lastUs, s.nEvents)
                cur = Some(SessionState(e.tsUs, e.tsUs, 1))
              case None =>
                cur = Some(SessionState(e.tsUs, e.tsUs, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }

  final case class AsofInput(key: Long, tsUs: Long, isEvent: Boolean,
      value: Double)
  final case class AsofState(updates: List[(Long, Double)])
  final case class AsofOut(key: Long, tsUs: Long, asofTs: Option[Long],
      asofValue: Option[Double])

  /** Streaming backward as-of enrichment: one mixed stream of
    * reference UPDATES (isEvent=false) and EVENTS (isEvent=true) per
    * key; every event is emitted with the latest update at-or-before
    * its event time (ties resolve to the update — the `<=` contract,
    * same as [[graft.ops.AsOfJoin.backward]], whose batch result the
    * spec pins this against).
    *
    * State per key is the retained update list, walked in event-time
    * order WITHIN each micro-batch (so intra-batch disorder resolves
    * exactly); an event arriving in a later batch than a
    * yet-to-arrive older update resolves against what has been seen —
    * the standard quote-lookup contract. State is pruned to updates
    * within `retainUs` of the newest timestamp seen, PLUS the single
    * newest older update (still the correct answer for events at the
    * horizon), so state is bounded by update rate × retention, never
    * by stream length.
    */
  def asofEnrich(in: Dataset[AsofInput], retainUs: Long): Dataset[AsofOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[AsofInput], state: GroupState[AsofState]) =>
          // updates sort before events at equal time: <= semantics
          val sorted = rows.toSeq.sortBy(r => (r.tsUs, r.isEvent))
          var ups = state.getOption.map(_.updates).getOrElse(Nil) // asc ts
          val out = Seq.newBuilder[AsofOut]
          sorted.foreach { r =>
            if (!r.isEvent) {
              // last-wins on equal update time, list kept ascending
              ups = (ups.filterNot(_._1 == r.tsUs) :+ (r.tsUs -> r.value))
                .sortBy(_._1)
            } else {
              val m = ups.filter(_._1 <= r.tsUs).lastOption
              out += AsofOut(key, r.tsUs, m.map(_._1), m.map(_._2))
            }
          }
          val seenMax = (sorted.map(_.tsUs) ++ ups.map(_._1))
            .foldLeft(Long.MinValue)(math.max)
          val (old, recent) = ups.partition(_._1 < seenMax - retainUs)
          state.update(AsofState(old.takeRight(1) ++ recent))
          out.result().iterator
      }
  }
}
