package graft

import graft.model._
import graft.sink.TableMeta
import graft.streaming.{CdcEngine, TopicSource}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths}

/** The streaming entry end-to-end over an UNBOUNDED directory topic:
  * files arrive while the query runs, offsets gate replay, and a
  * restarted query resumes from the Spark checkpoint without loss or
  * duplication — the S1/S2 surface the micro-batch harness relies on
  * (reference reader.go:145-292 + processor loop).
  */
class TopicStreamSpec extends SparkSpec {

  private val meta = TableMeta("users", StructType(Seq(
    StructField("id", LongType), StructField("name", StringType))), Seq("id"))

  private def mkEngine(root: String): CdcEngine = {
    val cfg = EngineConfig("inst1",
      Seq(StreamConfig(0, s"$root/src", "users", partitions = 2)),
      s"$root/dst", ProblemStrategy.Stop, buckets = 4)
    val e = new CdcEngine(spark, cfg, Map(0 -> meta))
    e.bootstrap()
    e
  }

  private def writeLines(dir: Path, name: String, lines: String*): Unit = {
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(name), lines.mkString("\n"))
  }

  test("live arrival across micro-batches, then checkpointed restart") {
    val root = Files.createTempDirectory("graft-topic").toString
    val p0 = Paths.get(s"$root/src/partition=0")
    val p1 = Paths.get(s"$root/src/partition=1")

    // wave 1: initial data + heartbeats on both partitions
    writeLines(p0, "a.jsonl",
      """{"update":{"name":"alice"},"key":[1],"ts":[1,1],"offset":0}""",
      """{"resolved":[3,0],"offset":1}""")
    writeLines(p1, "a.jsonl",
      """{"update":{"name":"bob"},"key":[2],"ts":[2,1],"offset":0}""",
      """{"resolved":[3,0],"offset":1}""")

    val e = mkEngine(root)
    val q = e.start(s"$root/ckpt")
    try {
      q.processAllAvailable()
      val w1 = e.readTable("users").collect().map(_.getLong(0)).toSet
      assert(w1 == Set(1L, 2L))

      // wave 2: files appended while the SAME query runs
      writeLines(p0, "b.jsonl",
        """{"update":{"name":"carol"},"key":[3],"ts":[4,1],"offset":2}""",
        """{"resolved":[6,0],"offset":3}""")
      writeLines(p1, "b.jsonl",
        """{"resolved":[6,0],"offset":2}""")
      q.processAllAvailable()
      val w2 = e.readTable("users").collect().map(_.getLong(0)).toSet
      assert(w2 == Set(1L, 2L, 3L))
    } finally q.stop()

    // wave 3: restart from the same checkpoint with a fresh engine
    // instance; a new file + an already-seen file replay must produce
    // no loss and no duplication
    writeLines(p0, "c.jsonl",
      """{"update":{"name":"dave"},"key":[4],"ts":[7,1],"offset":4}""",
      """{"resolved":[9,0],"offset":5}""")
    writeLines(p1, "c.jsonl",
      """{"resolved":[9,0],"offset":3}""")
    val e2 = mkEngine(root)
    val q2 = e2.start(s"$root/ckpt")
    try {
      q2.processAllAvailable()
      val rows = e2.readTable("users").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      assert(rows.length == 4, "duplicated rows after restart")
    } finally q2.stop()
  }

  test("kafka-shaped stream through the projection: live batches, restart, no loss/dup") {
    // contract test of TopicSource.kafkaProjection without the
    // connector jar: a MemoryStream with the kafka source's record
    // shape (value/partition/offset) drives the REAL engine through
    // startFromFrames, including a checkpointed restart
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = sparkS.sqlContext
    val root = Files.createTempDirectory("graft-kshape").toString
    val stream = MemoryStream[(Array[Byte], Int, Long)]
    val frames = TopicSource.kafkaProjection(
      stream.toDF().toDF("value", "partition", "offset"), tableId = 0)

    def rec(json: String, partition: Int, offset: Long) =
      (json.getBytes("UTF-8"), partition, offset)

    stream.addData(
      rec("""{"update":{"name":"alice"},"key":[1],"ts":[1,1]}""", 0, 0L),
      rec("""{"update":{"name":"bob"},"key":[2],"ts":[2,1]}""", 1, 0L),
      rec("""{"resolved":[3,0]}""", 0, 1L),
      rec("""{"resolved":[3,0]}""", 1, 1L))

    val e = mkEngine(root)
    val q = e.startFromFrames(frames, s"$root/ckpt")
    try {
      q.processAllAvailable()
      assert(e.readTable("users").collect().map(_.getLong(0)).toSet == Set(1L, 2L))

      // second wave while the same query runs
      stream.addData(
        rec("""{"update":{"name":"carol"},"key":[3],"ts":[4,1]}""", 0, 2L),
        rec("""{"resolved":[6,0]}""", 0, 3L),
        rec("""{"resolved":[6,0]}""", 1, 2L))
      q.processAllAvailable()
      assert(e.readTable("users").collect().map(_.getLong(0)).toSet ==
        Set(1L, 2L, 3L))
    } finally q.stop()

    // restart from the same checkpoint (same retained source): new
    // data applies exactly once, nothing replays into duplicates
    stream.addData(
      rec("""{"update":{"name":"dave"},"key":[4],"ts":[7,1]}""", 1, 3L),
      rec("""{"resolved":[9,0]}""", 0, 4L),
      rec("""{"resolved":[9,0]}""", 1, 4L))
    val e2 = mkEngine(root)
    val q2 = e2.startFromFrames(frames, s"$root/ckpt")
    try {
      q2.processAllAvailable()
      val rows = e2.readTable("users").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      assert(rows.length == 4, "duplicated rows after restart")
    } finally q2.stop()
  }

  test("kafka options: oauth2 delegates refresh to the client's OIDC login") {
    val creds = Files.createTempFile("oidc", ".json")
    Files.writeString(creds,
      """{"clientId":"svc-graft","clientSecret":"s3\"cret"}""")
    val provider = new graft.auth.OAuth2FileProvider(
      creds.toString, "https://issuer.example/token",
      exchange = (_, _) => fail("option build must not exchange a token"))
    val s = StreamConfig(0, "b:9092/t.cdc", "users", 8)
    val opts = TopicSource.kafkaOptions(s, auth = Some(provider))
    assert(opts("kafka.sasl.mechanism") == "OAUTHBEARER")
    assert(opts("kafka.sasl.oauthbearer.token.endpoint.url") ==
      "https://issuer.example/token")
    assert(opts("kafka.sasl.login.callback.handler.class")
      .endsWith("OAuthBearerLoginCallbackHandler"))
    val jaas = opts("kafka.sasl.jaas.config")
    assert(jaas.contains("OAuthBearerLoginModule required"))
    assert(jaas.contains("""clientId="svc-graft""""))
    assert(jaas.contains("""clientSecret="s3\"cret""""))
    // missing fields are a config error, not a silent bad login
    Files.writeString(creds, """{"clientId":"only"}""")
    intercept[IllegalArgumentException](
      TopicSource.kafkaOptions(s, auth = Some(provider)))
  }

  test("kafka options: brokers/topic split, offsets, sasl token escaping") {
    val s = StreamConfig(0, "broker1:9092,broker2:9092/events.cdc", "users", 8)
    val opts = TopicSource.kafkaOptions(s,
      auth = Some(graft.auth.StaticToken("""se"cret\x""")),
      startingOffsets = "latest")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "events.cdc")
    assert(opts("startingOffsets") == "latest")
    assert(opts("kafka.sasl.jaas.config").contains("""password="se\"cret\\x""""))
    intercept[IllegalArgumentException](
      TopicSource.kafkaOptions(StreamConfig(0, "no-topic-part", "u", 1)))
  }
}
