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
}
