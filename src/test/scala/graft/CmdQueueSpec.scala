package graft

import graft.model._
import graft.sink.TableMeta
import graft.streaming.CdcEngine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Command-queue conflict resolution (S10/J2, reference
  * processor.go:145-236): an out-of-order change consults the command
  * topic; "skip" drops it to the DLQ, "apply" processes it, the LAST
  * instruction for a conflict wins, and an unresolved conflict is
  * FATAL.
  */
class CmdQueueSpec extends SparkSpec {
  import spark.implicits._

  private val meta = TableMeta("users", StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))), Seq("id"))

  private def mkEngine(root: String): CdcEngine = {
    val cfg = EngineConfig("inst1",
      Seq(StreamConfig(0, s"$root/src", "users", partitions = 1)),
      s"$root/dst", ProblemStrategy.CmdQueue, buckets = 4)
    val e = new CdcEngine(spark, cfg, Map(0 -> meta))
    e.bootstrap()
    e
  }

  private def frame(lines: (String, Long, Long)*) =
    lines.toSeq.toDF("value", "partitionId", "offset")
      .withColumn("tableId", lit(0))

  private def writeCommands(root: String, cmds: String*): Unit = {
    val dir = Paths.get(s"$root/dst/commands")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("cmds.jsonl"), cmds.mkString("\n"))
  }

  test("skip instruction drops the conflicting change; apply keeps it; last wins") {
    val root = Files.createTempDirectory("graft-cmd").toString
    writeCommands(root,
      // conflict (4,1) on key [1]: first apply, then skip — skip wins
      """{"aardapel_instance_id":"inst1","path":"users","key":["1"],"ts":[4,1],"action":"apply"}""",
      """{"aardapel_instance_id":"inst1","path":"users","key":["1"],"ts":[4,1],"action":"skip"}""",
      // conflict (4,2) on key [2]: apply
      """{"aardapel_instance_id":"inst1","path":"users","key":["2"],"ts":[4,2],"action":"apply"}""",
      // other instance's command must be ignored
      """{"aardapel_instance_id":"other","path":"users","key":["3"],"ts":[4,3],"action":"apply"}""")
    val e = mkEngine(root)
    e.processBatch(frame(
      ("""{"resolved":[10,0]}""", 0L, 0L),
      ("""{"update":{"name":"skipped"},"key":[1],"ts":[4,1]}""", 0L, 1L),
      ("""{"update":{"name":"applied"},"key":[2],"ts":[4,2]}""", 0L, 2L),
      ("""{"update":{"name":"ok"},"key":[5],"ts":[11,1]}""", 0L, 3L),
      ("""{"resolved":[12,0]}""", 0L, 4L)), 0L)
    e.processBatch(frame(("""{"resolved":[13,0]}""", 0L, 5L)), 1L)
    val users = e.readTable("users").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!users.contains(1L))          // skipped
    assert(users.get(2L).contains("applied"))
    assert(users.get(5L).contains("ok"))
    val dlq = spark.read.parquet(s"$root/dst/dlq")
    assert(dlq.filter(col("reason") === "cmd-skip").count() == 1)
  }

  test("explicit seq wins across files regardless of listing order") {
    val root = Files.createTempDirectory("graft-cmd3").toString
    val dir = Paths.get(s"$root/dst/commands")
    Files.createDirectories(dir)
    // Adverse layout: the WINNING instruction (seq=2, apply) sits in
    // the alphabetically-first file; any listing-order "last wins"
    // logic would pick the seq=1 skip from the later file instead.
    Files.writeString(dir.resolve("a_first.jsonl"),
      """{"aardapel_instance_id":"inst1","path":"users","key":["1"],"ts":[4,1],"seq":2,"action":"apply"}""")
    Files.writeString(dir.resolve("z_last.jsonl"),
      """{"aardapel_instance_id":"inst1","path":"users","key":["1"],"ts":[4,1],"seq":1,"action":"skip"}""")
    val e = mkEngine(root)
    e.processBatch(frame(
      ("""{"resolved":[10,0]}""", 0L, 0L),
      ("""{"update":{"name":"kept"},"key":[1],"ts":[4,1]}""", 0L, 1L)), 0L)
    e.processBatch(frame(("""{"resolved":[13,0]}""", 0L, 2L)), 1L)
    val users = e.readTable("users").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(users.get(1L).contains("kept"))
  }

  test("unresolved conflict is FATAL") {
    val root = Files.createTempDirectory("graft-cmd2").toString
    val e = mkEngine(root)
    intercept[IllegalStateException] {
      e.processBatch(frame(
        ("""{"resolved":[10,0]}""", 0L, 0L),
        ("""{"update":{"name":"x"},"key":[9],"ts":[4,1]}""", 0L, 1L)), 0L)
    }
    assert(e.state.state == EngineState.Fatal)
  }
}
