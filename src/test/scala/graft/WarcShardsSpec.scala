package graft

import graft.ops.WarcShards
import org.apache.spark.sql.functions._

/** WARC shard container: roundtrip byte preservation, the warcinfo
  * opener, name-based range pruning (proven by corrupting an
  * out-of-range shard), and loud failure on every malformed-record
  * class.
  */
class WarcShardsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("warcspec").toString

  private def writeFixture(dir: String): Unit = {
    val docs = Seq(
      (0L, "http://a.com/0", "alpha body"),
      (1L, "http://a.com/1", "beta body"),
      (150L, "http://b.com/150", "gamma body"),
      (260L, "http://c.com/260", "delta body"))
      .toDF("doc_id", "u", "text")
    val n = WarcShards.write(docs, "doc_id", "u", "text",
      s"$dir/shards", docsPerShard = 100L)
    assert(n == 3L) // shards 0, 1, 2
  }

  test("roundtrip preserves bytes, uris and emits warcinfo openers") {
    val dir = freshDir()
    writeFixture(dir)
    val rows = WarcShards.read(spark, s"$dir/shards")
      .orderBy("record_id").collect()
    assert(rows.length == 7) // 4 responses + 3 warcinfo
    val resp = rows.filter(_.getAs[String]("warc_type") == "response")
    assert(resp.map(_.getAs[String]("target_uri")).toSeq ==
      Seq("http://a.com/0", "http://a.com/1", "http://b.com/150",
        "http://c.com/260"))
    assert(new String(resp.head.getAs[Array[Byte]]("payload"), "UTF-8")
      == "alpha body")
    val info = rows.filter(_.getAs[String]("warc_type") == "warcinfo")
    assert(info.map(_.getAs[String]("record_id")).toSeq ==
      Seq("urn:graft:info:00000", "urn:graft:info:00001",
        "urn:graft:info:00002"))
  }

  test("readRange prunes shard files BY NAME before opening bytes") {
    val dir = freshDir()
    writeFixture(dir)
    // corrupt the out-of-range shard 2: if the range read ever opened
    // it, the parser's loud-failure contract would throw
    val p = java.nio.file.Paths.get(s"$dir/shards/crawl-00002.warc")
    java.nio.file.Files.write(p, "GARBAGE NOT WARC".getBytes)
    val rows = WarcShards.readRange(spark, s"$dir/shards", 100L,
      1L, 200L).orderBy("record_id").collect()
    assert(rows.map(_.getAs[String]("record_id")).toSeq ==
      Seq("urn:graft:resp:000000000001", "urn:graft:resp:000000000150"))
    assert(rows.forall(_.getAs[String]("warc_type") == "response"))
    // empty range and no-file range return empty, never throw
    assert(WarcShards.readRange(spark, s"$dir/shards", 100L, 5L, 5L)
      .count() == 0L)
  }

  test("malformed records fail loudly, never truncate silently") {
    val dir = freshDir()
    def attempt(bytes: Array[Byte]): Exception = {
      val f = java.nio.file.Paths.get(dir, s"bad-${bytes.length}")
      java.nio.file.Files.createDirectories(f)
      java.nio.file.Files.write(f.resolve("crawl-00000.warc"), bytes)
      intercept[Exception] {
        WarcShards.read(spark, f.toString).collect()
      }
    }
    // a well-formed record assembled by the spec itself (the writer's
    // grammar, restated independently)
    val good = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:resp:000000000007>\r\n" +
      s"WARC-Date: ${WarcShards.Date}\r\n" +
      "WARC-Target-URI: http://x.com\r\n" +
      "Content-Type: text/html\r\n" +
      "Content-Length: 7\r\n" +
      "\r\npayload\r\n\r\n").getBytes
    // bad version line
    val badVersion = ("HTTP/1.1 200 OK\r\n\r\n").getBytes
    assert(attempt(badVersion).getMessage.contains("WARC"))
    // truncated payload: drop the final separator + 3 payload bytes
    assert(attempt(good.dropRight(7))
      .getMessage.contains("truncated WARC payload"))
    // missing separator: payload present, separator overwritten
    val noSep = good.clone(); noSep(noSep.length - 4) = 'X'
    assert(attempt(noSep).getMessage.contains("separator"))
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n" +
      "x\r\n\r\n").getBytes
    assert(attempt(noLen).getMessage.contains("Content-Length"))
  }

  test("id contract: out-of-range ids refuse at write time") {
    val dir = freshDir()
    val bad = Seq((-1L, "u", "t")).toDF("doc_id", "u", "text")
    val ex = intercept[Exception] {
      WarcShards.write(bad, "doc_id", "u", "text", s"$dir/s", 10L)
    }
    assert(ex.getMessage.contains("12-digit"))
  }

  test("uri contract: non-ASCII and CR/LF target URIs refuse loudly " +
      "at write time (US_ASCII would silently mangle them)") {
    def attempt(uri: String) = intercept[Exception] {
      WarcShards.write(Seq((1L, uri, "t")).toDF("doc_id", "u", "text"),
        "doc_id", "u", "text", s"${freshDir()}/s", 10L)
    }
    assert(attempt("http://ex.com/é").getMessage
      .contains("visible US-ASCII"))
    assert(attempt("http://ex.com/a\r\nInjected: x").getMessage
      .contains("visible US-ASCII"))
    assert(attempt("http://ex.com/a b").getMessage
      .contains("visible US-ASCII"))
  }
}
