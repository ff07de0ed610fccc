package graft

import graft.ops.TarShards
import org.apache.spark.sql.functions._

/** WebDataset-style tar shard container: roundtrip fidelity, shard
  * layout, ustar spec compliance (validated against the SYSTEM tar
  * binary, not just our own parser), and corruption detection.
  */
class TarShardsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (0L, "alpha"),
    (1L, ""), // empty payload: header-only entry, zero padding
    (2L, "b" * 513), // spans two data blocks, pad 511
    (5L, "gap in ids"), // shard assignment follows id div, not rank
    (6L, "last")).toDF("doc_id", "text")

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("tarspec").toString

  test("roundtrip: every payload byte survives, names carry the id") {
    val dir = tmp()
    val n = TarShards.write(fixture, "doc_id", "text", dir,
      docsPerShard = 3)
    // ids 0,1,2 -> shard 0; 5 -> shard 1; 6 -> shard 2
    assert(n == 3L)
    val back = TarShards.read(spark, dir)
      .select(expr("CAST(substring(name, 1, 12) AS BIGINT)").as("doc_id"),
        col("n_bytes"), col("payload").cast("string").as("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val want = fixture.collect()
      .map(r => (r.getLong(0), r.getString(1).length.toLong, r.getString(1)))
      .sortBy(_._1)
    assert(back.toSeq == want.toSeq)
  }

  test("shards are spec-compliant for the system tar binary") {
    val dir = tmp()
    TarShards.write(fixture, "doc_id", "text", dir, docsPerShard = 100)
    val tars = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tar"))
    assert(tars.length == 1)
    val listed = scala.sys.process.Process(
      Seq("tar", "-tf", tars.head.getAbsolutePath)).!!.trim
      .split("\n").toSeq.sorted
    assert(listed == Seq("000000000000.txt", "000000000001.txt",
      "000000000002.txt", "000000000005.txt", "000000000006.txt"))
  }

  test("writes are deterministic: same rows, any partitioning, same bytes") {
    val d1 = tmp(); val d2 = tmp()
    TarShards.write(fixture.repartition(7), "doc_id", "text", d1, 3)
    TarShards.write(fixture.repartition(1), "doc_id", "text", d2, 3)
    def bytes(d: String) = new java.io.File(d).listFiles().sortBy(_.getName)
      .map(f => (f.getName,
        java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))))
      .toSeq
    assert(bytes(d1) == bytes(d2))
    // every shard file is block-aligned (payload padding + EOF blocks)
    new java.io.File(d1).listFiles().foreach(f =>
      assert(f.length % 512 == 0, s"${f.getName} not block-aligned"))
  }

  test("readRange prunes files: a destroyed out-of-range shard is never opened") {
    val dir = tmp()
    TarShards.write(fixture, "doc_id", "text", dir, docsPerShard = 3)
    // ids 5,6 live in shards 1 and 2; destroy shard 0 entirely —
    // a read that touches it must fail, a pruned one must not
    val s0 = java.nio.file.Paths.get(dir, "shard-00000.tar")
    java.nio.file.Files.write(s0, "not a tar at all".getBytes)
    val got = TarShards.readRange(spark, dir, docsPerShard = 3,
        loId = 5, hiId = 7)
      .select(expr("CAST(substring(name, 1, 12) AS BIGINT)").as("id"),
        col("payload").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((5L, "gap in ids"), (6L, "last")))
    intercept[Exception] { TarShards.read(spark, dir).count() }
    // boundary residual: a range cutting INTO a shard still filters
    val empty = TarShards.readRange(spark, dir, docsPerShard = 3,
      loId = 7, hiId = 9)
    assert(empty.count() == 0)
  }

  test("write + readRange work through a Hadoop FileSystem scheme path") {
    // file: is the local stand-in for hdfs:/s3a: — it exercises the
    // Hadoop FileSystem code path (globStatus listing, FS.create
    // streams), NOT java.io.File. Before the port, readRange listed
    // via java.io.File and a scheme-qualified dir NPE'd.
    val dir = "file:" + tmp()
    val n = TarShards.write(fixture, "doc_id", "text", dir, docsPerShard = 3)
    assert(n == 3L)
    val got = TarShards.readRange(spark, dir, docsPerShard = 3,
        loId = 5, hiId = 7)
      .select(expr("CAST(substring(name, 1, 12) AS BIGINT)").as("id"),
        col("payload").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((5L, "gap in ids"), (6L, "last")))
  }

  test("ids outside the 12-digit name contract fail loudly") {
    // a negative id won't match readRange's shard-name regex and an
    // id >= 1e12 widens %012d past 12 chars, breaking the
    // substring(name,1,12) parse — both must be refused at write
    for (bad <- Seq(-1L, 1000000000000L)) {
      val dir = tmp()
      val ex = intercept[Exception] {
        TarShards.write(Seq((bad, "x")).toDF("doc_id", "text"),
          "doc_id", "text", dir, docsPerShard = 3)
      }
      def causes(t: Throwable): Seq[String] =
        if (t == null) Nil else t.getMessage +: causes(t.getCause)
      assert(causes(ex).exists(m =>
        m != null && m.contains("12-digit name contract")))
    }
  }

  test("trajectory export roundtrips through user-range shards") {
    // the 100 TB serving form: trajectories packed into shards keyed
    // by user range, then a user window read back through readRange's
    // name prune — via a Hadoop scheme path, like a real cluster.
    import graft.ops.Trajectories
    val events = Seq(
      (1L, 10L, "view", 100L), (1L, 11L, "click", 200L),
      (5L, 20L, "view", 50L), (5L, 21L, "buy", 40L), (5L, 22L, "view", 60L),
      (70L, 30L, "click", 10L)
    ).toDF("user_id", "event_id", "event_type", "t")
    val traj = Trajectories.export(events, col("t"), 2)
    val dir = "file:" + tmp() + "/traj"
    val n = Trajectories.writeShards(traj, dir, usersPerShard = 64)
    assert(n == 2L) // users {1,5} -> shard 0, user 70 -> shard 1
    val got = Trajectories.readShardRange(spark, dir, 64, 0L, 64L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    // k = 2 caps user 5 to its two EARLIEST events (t=40,50 -> ids 21,20)
    assert(got == Map(
      1L -> ((2L, "10,11", "view,click")),
      5L -> ((3L, "21,20", "buy,view"))))
    // the out-of-range shard is never opened: destroy it, reread
    val s1 = java.nio.file.Paths.get(dir.stripPrefix("file:"),
      "shard-00001.tar")
    java.nio.file.Files.write(s1, "garbage".getBytes)
    val again = Trajectories.readShardRange(spark, dir, 64, 0L, 64L)
    assert(again.count() == 2L)
  }

  test("a flipped payload byte is caught by the checksum on read") {
    val dir = tmp()
    TarShards.write(fixture, "doc_id", "text", dir, docsPerShard = 100)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar")).head.toPath
    val b = java.nio.file.Files.readAllBytes(f)
    b(130) = (b(130) ^ 1).toByte // inside the first header's mode field
    java.nio.file.Files.write(f, b)
    val ex = intercept[Exception] {
      TarShards.read(spark, dir).count()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("checksum")))
  }
}
