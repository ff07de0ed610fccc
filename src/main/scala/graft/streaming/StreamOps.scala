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

  final case class KmvBucketIn(bucket: Int, h: Long)
  final case class KmvBucketState(mins: Array[Long])
  final case class KmvBucketOut(bucket: Int, mins: Seq[Long])

  /** Streaming KMV distinct-cardinality sketch — the continuous form
    * of `ops.Sketch.kmvDistinct` for "how many distinct keys has this
    * stream carried so far". Rows are pre-bucketed by hash
    * ([[kmvBucketize]]) so state shuffles across `buckets` tasks, not
    * one; each bucket keeps its k smallest DISTINCT hashes (state ≤
    * buckets·k longs, inherently bounded — NoTimeout is safe because
    * the key domain is the fixed bucket set, not the data's keys).
    * Each trigger emits every updated bucket's current k-mins;
    * `Sketch.kmvMergeBuckets` folds any snapshot of them into the
    * global estimate, which is EXACTLY the batch sketch's answer over
    * the same rows: the global k smallest distinct hashes are a
    * subset of the union of per-bucket k smallest (spec-pinned).
    */
  def kmvSketchStream(hashed: Dataset[KmvBucketIn],
      k: Int): Dataset[KmvBucketOut] = {
    import hashed.sparkSession.implicits._
    hashed.groupByKey(_.bucket)
      .flatMapGroupsWithState[KmvBucketState, KmvBucketOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state: GroupState[KmvBucketState]) =>
          val cur = state.getOption.map(_.mins).getOrElse(Array.empty[Long])
          val merged = (cur ++ rows.map(_.h)).distinct.sorted.take(k)
          state.update(KmvBucketState(merged))
          Iterator(KmvBucketOut(bucket, merged.toSeq))
      }
  }

  /** Map (any frame, key column) to the bucketed hash rows
    * [[kmvSketchStream]] consumes — the same hash family as the batch
    * sketch, bucketed by its low bits.
    */
  def kmvBucketize(df: DataFrame, key: org.apache.spark.sql.Column,
      buckets: Int): Dataset[KmvBucketIn] = {
    import df.sparkSession.implicits._
    df.select(
        pmod(graft.ops.Sketch.kmvHash(key), lit(buckets.toLong))
          .cast("int").as("bucket"),
        graft.ops.Sketch.kmvHash(key).as("h"))
      .as[KmvBucketIn]
  }

  final case class MgIn(bucket: Int, key: String)
  final case class MgState(ver: Long, keys: Seq[String], cnts: Seq[Long],
      err: Long)
  final case class MgBucketSummary(bucket: Int, ver: Long, err: Long,
      keys: Seq[String], cnts: Seq[Long])

  /** Streaming Misra-Gries heavy hitters — the continuous form of
    * `ops.Sketch.heavyHittersExact`'s first pass: the hot-key census
    * runs AT INGEST instead of waiting for a batch job. Rows are
    * pre-bucketed by key hash ([[mgBucketize]]) so state shuffles
    * across `buckets` tasks, not one; each bucket folds its batch's
    * keys into a standing MG summary of at most `cap` counters (the
    * SAME [[graft.functions.MgBuffer]] the batch aggregate uses, so
    * stream and batch carry one invariant: per key, residual ≤ true
    * count ≤ residual + err, and any key whose true count within the
    * bucket exceeds err IS present). State is ≤ buckets·cap counters,
    * inherently bounded — NoTimeout is safe because the key domain of
    * the STATE is the fixed bucket set, never the data's keys.
    *
    * Each trigger emits every updated bucket's current summary with a
    * monotone `ver`; a snapshot of the latest (max-ver) row per
    * bucket feeds [[graft.ops.Sketch.heavyHittersExactFromSummaries]]
    * for the exact-or-loud top-k over everything ingested so far
    * (buckets partition the key space, so candidacy evidence never
    * crosses buckets). Residuals are arrival-order dependent — the MG
    * guarantee is order-free, which is why equality with the batch
    * operator is pinned at the exact-confirm level, not bit-by-bit on
    * the summaries (spec: MgHeavyStreamSpec).
    */
  def mgHeavyStream(in: Dataset[MgIn], cap: Int): Dataset[MgBucketSummary] = {
    require(cap >= 1, s"need cap >= 1, got $cap")
    import in.sparkSession.implicits._
    in.groupByKey(_.bucket)
      .flatMapGroupsWithState[MgState, MgBucketSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket, rows, state: GroupState[MgState]) =>
          val buf = new graft.functions.MgBuffer(cap)
          state.getOption.foreach { s =>
            s.keys.iterator.zip(s.cnts.iterator).foreach {
              case (k, c) => buf.m.update(k, c)
            }
            buf.err = s.err
          }
          rows.foreach(r => buf.add(r.key, 1L))
          val items = buf.m.toArray.sortBy { case (k, c) => (-c, k) }
          val ver = state.getOption.map(_.ver + 1L).getOrElse(1L)
          val keys = items.map(_._1).toSeq
          val cnts = items.map(_._2).toSeq
          state.update(MgState(ver, keys, cnts, buf.err))
          Iterator(MgBucketSummary(bucket, ver, buf.err, keys, cnts))
      }
  }

  /** Map (any frame, key column) to the bucketed key rows
    * [[mgHeavyStream]] consumes — hash-partitioned into `buckets`
    * disjoint key subspaces (null keys dropped, like the batch
    * operator's filter).
    */
  def mgBucketize(df: DataFrame, key: org.apache.spark.sql.Column,
      buckets: Int): Dataset[MgIn] = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    import df.sparkSession.implicits._
    df.select(key.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .select(
        pmod(graft.functions.GraftFunctions.portableHash(col("key")),
          lit(buckets.toLong)).cast("int").as("bucket"),
        col("key"))
      .as[MgIn]
  }

  final case class CmIn(j: Int, b: Long)
  final case class CmState(counts: Map[Long, Long])
  final case class CmOut(j: Int, b: Long, c: Long)

  /** Streaming count-min sketch — the continuous form of
    * `ops.Sketch.countMin`. Rows arrive pre-mapped to (row j, bucket
    * b) pairs ([[cmBucketize]]); state is keyed by sketch ROW (a
    * fixed `depth`-sized key domain — NoTimeout is safe), each row
    * holding its width-bounded counter map. Every trigger emits the
    * updated counters; a snapshot of the latest (j, b) → c rows IS
    * the count-min table, probed exactly like the batch one
    * (spec-pinned equal to `Sketch.countMin` over the same rows).
    */
  def cmSketchStream(pairs: Dataset[CmIn]): Dataset[CmOut] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_.j)
      .flatMapGroupsWithState[CmState, CmOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (j, rows, state: GroupState[CmState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          val touched = scala.collection.mutable.Set.empty[Long]
          rows.foreach { r =>
            counts = counts.updated(r.b, counts.getOrElse(r.b, 0L) + 1L)
            touched += r.b
          }
          state.update(CmState(counts))
          touched.iterator.map(b => CmOut(j, b, counts(b))).toSeq.iterator
      }
  }

  /** Map (frame, key column) to the (row, bucket) pairs
    * [[cmSketchStream]] consumes — one input row explodes to `depth`
    * pairs through the batch sketch's shared hash family.
    */
  def cmBucketize(df: DataFrame, key: org.apache.spark.sql.Column,
      depth: Int, width: Int): Dataset[CmIn] = {
    import df.sparkSession.implicits._
    val h = graft.ops.Sketch.kmvHash(key)
    df.select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"),
          graft.ops.Sketch.cmBucket(h, j, width).as("b"))): _*)).as("p"))
      .select(col("p.j").as("j"), col("p.b").as("b"))
      .as[CmIn]
  }

  final case class SessionInput(userId: Long, tsUs: Long)
  final case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)
  final case class SessionOut(userId: Long, startUs: Long, endUs: Long,
      nEvents: Long)

  /** Gap-based sessionization with explicit state —
    * flatMapGroupsWithState keyed by user. A session closes when a
    * later event for the same key arrives beyond the gap (event-time
    * driven, deterministic — the batch-twin pinning form; idle keys
    * hold their open session, so production use wants
    * [[sessionizeTimeout]], which flushes them via the watermark).
    * The batch-checkable twin is the cdc_sessionize oracle query.
    */
  def sessionize(events: Dataset[SessionInput], gapUs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        sessionGroup(gapUs, timeout = false))
  }

  /** The per-group session fold, shared by the NoTimeout form above
    * (deterministic batch-twin pinning) and the EventTimeTimeout form
    * below (production state hygiene). On a timeout firing the open
    * session is closed and the key's state removed.
    */
  private def sessionGroup(gapUs: Long, timeout: Boolean)(
      userId: Long, rows: Iterator[SessionInput],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (timeout && state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(userId, s.startUs, s.lastUs, s.nEvents))
    } else {
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
      cur.foreach { s =>
        state.update(s)
        // close via watermark once the gap has provably elapsed
        if (timeout) state.setTimeoutTimestamp(math.max(
          (s.lastUs + gapUs) / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
      }
      closed.result().iterator
    }
  }

  /** [[sessionize]] with idle-key flush: EventTimeTimeout closes an
    * open session (and frees its state) once the watermark passes
    * lastEvent + gap — an idle key EMITS its session instead of
    * holding it forever, and state size tracks the live-key set, not
    * the all-time key set. `events` needs (`userCol` long, `tsCol`
    * timestamp); the watermark is declared here because the timeout
    * clock IS the watermark.
    */
  final case class SessionInputT(userId: Long, tsUs: Long,
      ts: java.sql.Timestamp)

  def sessionizeTimeout(events: DataFrame, gapUs: Long,
      watermark: String = "10 minutes", userCol: String = "user_id",
      tsCol: String = "ts"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark(tsCol, watermark)
      // the watermarked attribute must SURVIVE into the
      // flatMapGroupsWithState input (Spark's event-time-timeout
      // check looks for it there), hence the wider input type
      .select(col(userCol).as("userId"), unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("ts"))
      .as[SessionInputT]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionInputT],
            state: GroupState[SessionState]) =>
          sessionGroup(gapUs, timeout = true)(
            userId, rows.map(r => SessionInput(r.userId, r.tsUs)), state)
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
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        asofGroup(retainUs, expire = false))
  }

  /** Ordered insert into the ascending update list: one O(n) walk
    * (replacing an equal-time entry last-wins) instead of the
    * filter + append + full re-sort the first cut did per update.
    */
  private def insertUpdate(ups: List[(Long, Double)], t: Long,
      v: Double): List[(Long, Double)] = {
    val (before, rest) = ups.span(_._1 < t)
    before ++ ((t -> v) :: rest.dropWhile(_._1 == t))
  }

  private def asofGroup(retainUs: Long, expire: Boolean)(
      key: Long, rows: Iterator[AsofInput],
      state: GroupState[AsofState]): Iterator[AsofOut] = {
    if (expire && state.hasTimedOut) {
      // retention elapsed with no activity: every stored update is
      // older than any future in-watermark event's lookback window,
      // so the state answers nothing a tolerance contract would keep
      state.remove()
      Iterator.empty
    } else {
      // updates sort before events at equal time: <= semantics
      val sorted = rows.toSeq.sortBy(r => (r.tsUs, r.isEvent))
      var ups = state.getOption.map(_.updates).getOrElse(Nil) // asc ts
      val out = Seq.newBuilder[AsofOut]
      sorted.foreach { r =>
        if (!r.isEvent) ups = insertUpdate(ups, r.tsUs, r.value)
        else {
          val m = ups.filter(_._1 <= r.tsUs).lastOption
          out += AsofOut(key, r.tsUs, m.map(_._1), m.map(_._2))
        }
      }
      val seenMax = (sorted.map(_.tsUs) ++ ups.map(_._1))
        .foldLeft(Long.MinValue)(math.max)
      val (old, recent) = ups.partition(_._1 < seenMax - retainUs)
      state.update(AsofState(old.takeRight(1) ++ recent))
      if (expire) state.setTimeoutTimestamp(math.max(
        (seenMax + retainUs) / 1000L + 1L, state.getCurrentWatermarkMs + 1L))
      out.result().iterator
    }
  }

  /** [[asofEnrich]] with idle-key expiry: EventTimeTimeout drops a
    * key's update list once the watermark passes its last activity +
    * retention. Contract change vs the NoTimeout form, stated
    * plainly: after expiry a late-arriving event gets NO match (the
    * horizon update is gone) — the same answer the batch
    * [[graft.ops.AsOfJoin.backward]] with `tolerance = retainUs`
    * gives, since every expired update is staler than the tolerance.
    * State size tracks keys active within retention, not stream
    * lifetime. `in` needs (key long, ts timestamp, isEvent boolean,
    * value double) with event time in `tsCol`.
    */
  final case class AsofInputT(key: Long, tsUs: Long, isEvent: Boolean,
      value: Double, ts: java.sql.Timestamp)

  def asofEnrichTimeout(in: DataFrame, retainUs: Long,
      watermark: String = "10 minutes",
      tsCol: String = "ts"): Dataset[AsofOut] = {
    val spark = in.sparkSession
    import spark.implicits._
    in.withWatermark(tsCol, watermark)
      // wider input type: the watermarked attribute must reach the
      // flatMapGroupsWithState input for EventTimeTimeout
      .select(col("key").cast("long").as("key"),
        unix_micros(col(tsCol)).as("tsUs"),
        col("isEvent"), col("value").cast("double").as("value"),
        col(tsCol).as("ts"))
      .as[AsofInputT]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[AsofInputT],
            state: GroupState[AsofState]) =>
          asofGroup(retainUs, expire = true)(key,
            rows.map(r => AsofInput(r.key, r.tsUs, r.isEvent, r.value)),
            state)
      }
  }

  /** Stream-stream interval join — the continuous form of the batch
    * q_interval_overlap/RangeJoin family: inner-join two live streams
    * on a key where the right event time falls within ±`tolerance`
    * of the left. Built on Spark's native stream-stream join: the
    * symmetric interval condition plus BOTH watermarks is exactly
    * what lets Spark derive a state-eviction predicate for each side
    * (rows older than watermark+tolerance can never match a future
    * arrival and are dropped from the join state) — without the time
    * bound the state would grow without limit, which is why this
    * wrapper takes `tolerance` as a required argument rather than
    * defaulting to an unbounded equi-join.
    *
    * `ltCol`/`rtCol` must be DISTINCT column names (both survive into
    * the output so the caller can compute the actual gap); the key
    * columns collapse into one via the using-join. At 100 TB-rate
    * streams both sides hash-partition on the key — the same shuffle
    * a batch equi-join pays — and state stays
    * O(rate × (watermark + tolerance)).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      ltCol: String, rtCol: String, watermark: String,
      tolerance: String): DataFrame = {
    require(ltCol != rtCol,
      "intervalJoinStream needs distinct left/right time column names")
    val l = left.withWatermark(ltCol, watermark)
    val r = right.withWatermark(rtCol, watermark)
    l.join(r, Seq(key), "inner")
      .where(col(rtCol) >= col(ltCol) - expr(s"INTERVAL $tolerance") &&
        col(rtCol) <= col(ltCol) + expr(s"INTERVAL $tolerance"))
  }
}
