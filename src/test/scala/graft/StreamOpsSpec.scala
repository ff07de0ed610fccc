package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionInput, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming window/session operators driven through real streaming
  * queries over MemoryStream sources.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked tumbling window aggregates an event stream") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingCounts(events, "5 minutes", "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumble").start()
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), "view", 3.0))
    q.processAllAvailable()
    val rows = spark.table("tumble")
      .select(col("window.start").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L),
      ("2024-01-01 11:00:00", "view", 1L)))
  }

  test("streaming dedup keeps the first arrival per key across batches") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String, Long)]
    val docs = in.toDF().toDF("ts", "content_hash", "doc_id")
    val q = StreamOps.dedupWithinWatermark(docs, "ts", "1 hour", "content_hash")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup").start()
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "h1", 1L),
      (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), "h2", 2L))
    q.processAllAvailable()
    // a later micro-batch re-delivers h1 within the watermark
    in.addData(
      (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "h1", 3L),
      (java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), "h3", 4L))
    q.processAllAvailable()
    val kept = spark.table("dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    q.stop()
    assert(kept == Set(1L, 2L, 4L)) // doc 3 (duplicate of h1) dropped
  }

  test("streaming KMV sketch merges to exactly the batch estimate") {
    import graft.streaming.StreamOps.KmvBucketIn
    implicit val sq = spark.sqlContext
    val k = 64
    val buckets = 8
    val keys1 = (0L until 3000L).map(i => s"k$i")
    val keys2 = (1500L until 5000L).map(i => s"k$i") // overlap + new
    val in = MemoryStream[String]
    val hashed = StreamOps.kmvBucketize(in.toDF().toDF("key"),
      col("key"), buckets)
    val q = StreamOps.kmvSketchStream(hashed, k)
      .writeStream.outputMode("update")
      .format("memory").queryName("kmvs").start()
    in.addData(keys1: _*)
    q.processAllAvailable()
    in.addData(keys2: _*)
    q.processAllAvailable()
    // latest emitted state per bucket (update mode appends revisions)
    val snap = spark.table("kmvs").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1)))
      .zipWithIndex
      .groupBy(_._1._1).map { case (_, rs) => rs.maxBy(_._2)._1._2 }.toSeq
    q.stop()
    val got = graft.ops.Sketch.kmvMergeBuckets(k, snap)
    val batch = graft.ops.Sketch.kmvDistinct(
      (keys1 ++ keys2).toDF("key"), col("key"), k)
    assert(got === batch, s"stream $got vs batch $batch")
    assert(math.abs(got.estimate - 5000.0) / 5000.0 < 0.5)
  }

  test("streaming count-min equals the batch sketch over the same rows") {
    import graft.streaming.StreamOps.CmOut
    implicit val sq = spark.sqlContext
    val depth = 3; val width = 16
    val keys1 = (0L until 800L).map(i => s"k${i % 60}")
    val keys2 = (0L until 500L).map(i => s"k${i % 35}")
    val in = MemoryStream[String]
    val pairs = StreamOps.cmBucketize(in.toDF().toDF("key"),
      col("key"), depth, width)
    val q = StreamOps.cmSketchStream(pairs)
      .writeStream.outputMode("update")
      .format("memory").queryName("cms").start()
    in.addData(keys1: _*)
    q.processAllAvailable()
    in.addData(keys2: _*)
    q.processAllAvailable()
    // latest emitted counter per (j, b)
    val table = Array.fill(depth, width)(0L)
    spark.table("cms").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .zipWithIndex.groupBy(_._1._1)
      .foreach { case ((j, b), rs) => table(j)(b.toInt) = rs.maxBy(_._2)._1._2 }
    q.stop()
    val batch = graft.ops.Sketch.countMin(
      (keys1 ++ keys2).toDF("key"), col("key"), depth, width)
    assert(table.map(_.toSeq).toSeq === batch.table.map(_.toSeq).toSeq)
  }

  test("graft_topk aggregates a stream in update mode == batch top-k") {
    import graft.functions.TopKPairsAgg.topkPairs
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val q = in.toDF().toDF("g", "v", "i")
      .groupBy("g").agg(topkPairs(col("v"), col("i"), 2).as("top"))
      .writeStream.outputMode("update")
      .format("memory").queryName("stopk").start()
    in.addData((0L, 10L, 1L), (0L, 30L, 3L), (1L, 5L, 5L))
    q.processAllAvailable()
    in.addData((0L, 20L, 2L), (1L, 50L, 6L)) // state must merge heaps
    q.processAllAvailable()
    val latest = spark.table("stopk").collect()
      .map(r => (r.getLong(0), r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getLong(0), e.getLong(1)))))
      .zipWithIndex.groupBy(_._1._1)
      .map { case (g, rs) => g -> rs.maxBy(_._2)._1._2 }
    q.stop()
    assert(latest(0L) === Seq((30L, 3L), (20L, 2L)))
    assert(latest(1L) === Seq((50L, 6L), (5L, 5L)))
  }

  test("streaming as-of enrichment matches the batch as-of join") {
    import graft.streaming.StreamOps.{AsofInput, AsofOut}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[AsofInput]
    val q = StreamOps.asofEnrich(in.toDS(), retainUs = 100000000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof").start()
    // batch 1: out-of-order WITHIN the batch (event at t=30 arrives
    // before the t=20 update that should enrich it) + an exact tie
    in.addData(
      AsofInput(1, 30L, isEvent = true, 0.0),
      AsofInput(1, 10L, isEvent = false, 1.5),
      AsofInput(1, 20L, isEvent = false, 2.5),
      AsofInput(1, 20L, isEvent = true, 0.0), // tie → the t=20 update
      AsofInput(2, 5L, isEvent = true, 0.0))  // no update yet → null
    q.processAllAvailable()
    // batch 2: state carries across batches
    in.addData(
      AsofInput(1, 40L, isEvent = true, 0.0),
      AsofInput(2, 50L, isEvent = false, 9.0),
      AsofInput(2, 60L, isEvent = true, 0.0))
    q.processAllAvailable()
    val got = spark.table("asof").as[AsofOut].collect()
      .map(o => (o.key, o.tsUs) -> o.asofValue).toMap
    q.stop()
    assert(got == Map(
      (1L, 20L) -> Some(2.5), (1L, 30L) -> Some(2.5),
      (1L, 40L) -> Some(2.5), (2L, 5L) -> None, (2L, 60L) -> Some(9.0)))
    // the batch operator agrees row-for-row on the same data
    val left = Seq((1L, 20L), (1L, 30L), (1L, 40L), (2L, 5L), (2L, 60L))
      .toDF("k", "t")
    val right = Seq((1L, 10L, 1.5), (1L, 20L, 2.5), (2L, 50L, 9.0))
      .toDF("k", "rt", "v")
    val batch = graft.ops.AsOfJoin.backward(left, right, Seq("k"),
        "t", "rt", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(batch == got)
  }

  test("stream-stream interval join matches the batch interval predicate") {
    implicit val sq = spark.sqlContext
    val lin = MemoryStream[(java.sql.Timestamp, Long, String)]
    val rin = MemoryStream[(java.sql.Timestamp, Long, String)]
    val joined = StreamOps.intervalJoinStream(
      lin.toDF().toDF("lt", "k", "lv"),
      rin.toDF().toDF("rt", "k", "rv"),
      key = "k", ltCol = "lt", rtCol = "rt",
      watermark = "10 seconds", tolerance = "30 seconds")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivj").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: left arrives BEFORE its right match (stream-stream
    // state must hold it), one in-window pair, one out-of-window
    lin.addData(
      (ts("2024-01-01 10:00:00"), 1L, "a"),
      (ts("2024-01-01 10:05:00"), 1L, "b"),
      (ts("2024-01-01 10:00:00"), 2L, "c"))
    rin.addData((ts("2024-01-01 10:00:20"), 1L, "x"))
    q.processAllAvailable()
    // batch 2: late-but-in-watermark right row matches the held left;
    // wrong-key row matches nothing
    rin.addData(
      (ts("2024-01-01 10:05:10"), 1L, "y"),
      (ts("2024-01-01 10:00:10"), 3L, "z"))
    q.processAllAvailable()
    val got = spark.table("ivj")
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // the scale claim: the interval bound + watermarks must yield a
    // state-eviction predicate, so rows far behind the watermark
    // leave the join state instead of accumulating forever
    lin.addData((ts("2024-01-01 11:00:00"), 9L, "w"))
    rin.addData((ts("2024-01-01 11:00:00"), 9L, "w"))
    q.processAllAvailable()
    lin.addData((ts("2024-01-01 11:30:00"), 9L, "w2"))
    rin.addData((ts("2024-01-01 11:30:00"), 9L, "w2"))
    q.processAllAvailable() // watermark now ~11:29:50 — 10:0x state dead
    lin.addData((ts("2024-01-01 11:30:01"), 9L, "w3"))
    q.processAllAvailable() // one more batch so eviction is committed
    val state = q.lastProgress.stateOperators
    assert(state.nonEmpty)
    val held = state.map(_.numRowsTotal).sum
    assert(held < 10,
      s"join state held $held rows — eviction predicate not derived")
    q.stop()
    // (1,a)~x within 30s; (1,b)~y within 30s; b~x is 4:40 apart — out;
    // a~y likewise; key 2 and 3 never pair
    assert(got == Set((1L, "a", "x"), (1L, "b", "y")))
    // the batch twin with the identical predicate agrees
    val lb = Seq((ts("2024-01-01 10:00:00"), 1L, "a"),
      (ts("2024-01-01 10:05:00"), 1L, "b"),
      (ts("2024-01-01 10:00:00"), 2L, "c")).toDF("lt", "k", "lv")
    val rb = Seq((ts("2024-01-01 10:00:20"), 1L, "x"),
      (ts("2024-01-01 10:05:10"), 1L, "y"),
      (ts("2024-01-01 10:00:10"), 3L, "z")).toDF("rt", "k", "rv")
    val batch = lb.join(rb, Seq("k"))
      .where(col("rt") >= col("lt") - expr("INTERVAL 30 seconds") &&
        col("rt") <= col("lt") + expr("INTERVAL 30 seconds"))
      .select("k", "lv", "rv").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(batch == got)
  }

  test("as-of enrichment state stays bounded by the retention window") {
    import graft.streaming.StreamOps.AsofInput
    implicit val sq = spark.sqlContext
    val in = MemoryStream[AsofInput]
    val q = StreamOps.asofEnrich(in.toDS(), retainUs = 10L)
      .writeStream.outputMode("append")
      .format("memory").queryName("asofprune").start()
    // many updates far apart: after the last batch only the newest
    // in-window updates plus ONE older survivor may remain, and an
    // event at the horizon still enriches correctly from the survivor
    in.addData((0 until 50).map(i =>
      AsofInput(1, i * 100L, isEvent = false, i.toDouble)): _*)
    q.processAllAvailable()
    in.addData(AsofInput(1, 4905L, isEvent = true, 0.0))
    q.processAllAvailable()
    val got = spark.table("asofprune")
      .select("asofValue").collect().map(_.getDouble(0)).toSeq
    q.stop()
    assert(got == Seq(49.0)) // newest update <= 4905 is t=4900 (value 49)
  }

  test("flatMapGroupsWithState sessionization closes sessions on gaps") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SessionInput]
    val q = StreamOps.sessionize(in.toDS(), gapUs = 1000000L) // 1s gap
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // user 1: two sessions separated by a 5s gap; second still open
    in.addData(SessionInput(1, 1000000), SessionInput(1, 1500000),
      SessionInput(1, 7000000), SessionInput(2, 1000000))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[SessionOut].collect().toSet
    q.stop()
    assert(closed.contains(SessionOut(1, 1000000, 1500000, 2)))
    assert(!closed.exists(s => s.userId == 1 && s.startUs == 7000000)) // open
  }

  test("stateful ops behave identically under the RocksDB state store") {
    // the default tests run on the HDFS-backed store; a production
    // deployment with large state runs RocksDB, whose state encoders
    // differ — pin that the flatMapGroupsWithState fold (sessionize)
    // and a watermarked dedup produce the same results there
    implicit val sq = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[SessionInput]
      val q = StreamOps.sessionize(in.toDS(), gapUs = 1000000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("sessions_rocks").start()
      in.addData(SessionInput(1, 1000000), SessionInput(1, 1500000),
        SessionInput(2, 1000000))
      q.processAllAvailable()
      // cross-batch state survives the RocksDB roundtrip: the second
      // batch extends user 1's open session, the third closes it
      in.addData(SessionInput(1, 1800000))
      q.processAllAvailable()
      in.addData(SessionInput(1, 9000000))
      q.processAllAvailable()
      val closed = spark.table("sessions_rocks").as[SessionOut]
        .collect().toSet
      q.stop()
      assert(closed.contains(SessionOut(1, 1000000, 1800000, 3)))

      val in2 = MemoryStream[(java.sql.Timestamp, String, Long)]
      val docs = in2.toDF().toDF("ts", "content_hash", "doc_id")
      val q2 = StreamOps.dedupWithinWatermark(docs, "ts", "1 hour",
          "content_hash")
        .writeStream.outputMode("append")
        .format("memory").queryName("dedup_rocks").start()
      in2.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "h1", 1L))
      q2.processAllAvailable()
      in2.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "h1", 3L),
        (java.sql.Timestamp.valueOf("2024-01-01 10:06:00"), "h3", 4L))
      q2.processAllAvailable()
      val kept = spark.table("dedup_rocks").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      q2.stop()
      assert(kept == Set(1L, 4L))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("sessionizeTimeout flushes an idle key's open session via the watermark") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")
    val q = StreamOps.sessionizeTimeout(events, gapUs = 1000000L,
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessto").start()
    in.addData((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00.5")))
    q.processAllAvailable()
    // user 1 goes idle; OTHER keys advance the watermark past its gap
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 10:01:00")))
    q.processAllAvailable()
    in.addData((2L, java.sql.Timestamp.valueOf("2024-01-01 10:02:00")))
    q.processAllAvailable()
    val closed = spark.table("sessto").as[SessionOut].collect().toSet
    val stateRows = q.lastProgress.stateOperators.toSeq
      .map(_.numRowsTotal).sum
    q.stop()
    // the idle key's session closed WITHOUT another event of its own
    assert(closed.exists(s => s.userId == 1 && s.nEvents == 2))
    // and its state is gone: only user 2's open session remains
    assert(stateRows == 1)
  }

  test("asofEnrichTimeout expires idle keys; state tracks live keys under churn") {
    import graft.streaming.StreamOps.AsofOut
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Boolean, Double)]
    val df = in.toDF().toDF("key", "ts", "isEvent", "value")
    val q = StreamOps.asofEnrichTimeout(df, retainUs = 1000000L,
        watermark = "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("asofto").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // churn: each batch a NEW key posts an update, older keys idle out
    in.addData((1L, ts("2024-01-01 10:00:00"), false, 1.0))
    q.processAllAvailable()
    in.addData((2L, ts("2024-01-01 10:00:10"), false, 2.0))
    q.processAllAvailable()
    in.addData((3L, ts("2024-01-01 10:00:20"), false, 3.0))
    q.processAllAvailable()
    in.addData((4L, ts("2024-01-01 10:00:30"), false, 4.0))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.toSeq
      .map(_.numRowsTotal).sum
    // key 1..2 expired (idle > retention when the watermark advanced);
    // an expired key's late event gets NO match — the tolerance answer
    in.addData((1L, ts("2024-01-01 10:00:31"), true, 0.0))
    q.processAllAvailable()
    val got = spark.table("asofto").as[AsofOut].collect()
      .filter(_.key == 1L).map(_.asofValue).toSeq
    q.stop()
    assert(stateRows <= 2, s"state should track live keys, got $stateRows")
    assert(got == Seq(None))
  }
}
