package graft.ops

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.sources.HadoopConfBox
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive) shard container — the format crawl corpora
  * actually arrive in (Common Crawl et al.): length-prefixed records
  * with named CRLF headers, one `warcinfo` record opening each file,
  * one `response` record per captured page. Reference format: the
  * ISO 28500 / WARC/1.0 record grammar (version line, header lines,
  * `Content-Length`, blank line, payload, blank record separator) —
  * public knowledge, implemented from the spec.
  *
  * Determinism contract: same rows → same bytes. `WARC-Date` is
  * pinned (a capture timestamp is data, not wall clock — callers put
  * real fetch times in their own columns) and record ids derive from
  * the sample id (`urn:graft:resp:<id %012d>`), which doubles as the
  * range-pruning index.
  *
  * Scale shape: [[TarShards]]'s exactly — shard = id div
  * docsPerShard (contiguous ranges, so an id predicate prunes FILES
  * by name before a byte is opened), one hash shuffle on the shard
  * id + an intra-partition sort, each shard streamed by its owning
  * partition with one record buffered at a time. The byte codec
  * lives at the sanctioned `mapPartitions` seam (same ruling as the
  * tar codec). A malformed record fails LOUDLY — truncation and
  * header corruption must never read as a shorter corpus.
  */
object WarcShards {

  /** Pinned capture date (see the determinism contract). */
  val Date = "2026-01-01T00:00:00Z"

  private val CRLF = "\r\n"

  private[ops] def record(tpe: String, recordId: String, uri: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    // The header block is US-ASCII; getBytes(US_ASCII) would
    // SILENTLY replace non-ASCII with '?' (corrupting the URI with
    // no error) and a CR/LF inside the value would break record
    // framing. Same-rows → same-bytes means both must fail loudly,
    // like the id-range check: a real crawler percent-encodes
    // upstream.
    var i = 0
    while (i < uri.length) {
      val c = uri.charAt(i)
      require(c >= 0x21 && c <= 0x7e,
        s"WARC-Target-URI must be visible US-ASCII (percent-encode " +
          s"upstream); got char 0x${c.toInt.toHexString} at $i in: $uri")
      i += 1
    }
    val sb = new StringBuilder
    sb.append("WARC/1.0").append(CRLF)
    sb.append("WARC-Type: ").append(tpe).append(CRLF)
    sb.append("WARC-Record-ID: <").append(recordId).append(">")
      .append(CRLF)
    sb.append("WARC-Date: ").append(Date).append(CRLF)
    if (uri.nonEmpty)
      sb.append("WARC-Target-URI: ").append(uri).append(CRLF)
    sb.append("Content-Type: ").append(contentType).append(CRLF)
    sb.append("Content-Length: ").append(payload.length).append(CRLF)
    sb.append(CRLF)
    val head = sb.toString.getBytes(US_ASCII)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def infoPayload(shard: Long): Array[Byte] =
    (s"software: graft$CRLF" + f"graft-shard: $shard%05d$CRLF")
      .getBytes(US_ASCII)

  /** Pack (id, uri, payload) rows into `dir/crawl-NNNNN.warc`,
    * `docsPerShard` consecutive ids per shard, each file opened by
    * its `warcinfo` record. Returns the shard count. Ids must fit
    * the 12-digit record-id contract (the range index) — out-of-range
    * ids fail loudly, exactly like the tar sink.
    */
  def write(df: DataFrame, id: String, uri: String, payload: String,
      dir: String, docsPerShard: Long): Long = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val confBox = new HadoopConfBox(spark.sessionState.newHadoopConf())
    val base = new Path(dir)
    base.getFileSystem(confBox.value).mkdirs(base)
    val dirStr = dir
    df.select(col(id).cast("long").as("id"),
        col(uri).cast("string").as("u"),
        col(payload).cast("binary").as("p"))
      .withColumn("shard", expr(s"id div $docsPerShard"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .select(col("shard"), col("id"), col("u"), col("p"))
      .as[(Long, Long, String, Array[Byte])]
      .mapPartitions { it =>
        lazy val fs = {
          val f = FileSystem.newInstance(
            new Path(dirStr).toUri, confBox.value)
          f.setWriteChecksum(false)
          f
        }
        var out: java.io.OutputStream = null
        var cur = Long.MinValue
        var n = 0L
        def close(): Unit = if (out != null) { out.close(); out = null }
        val done = it.map { case (shard, sid, u, bytes) =>
          require(sid >= 0L && sid < 1000000000000L,
            s"sample id $sid outside the 12-digit record-id contract " +
              "[0, 1e12) — the shard name range index would corrupt")
          if (shard != cur) {
            close(); cur = shard; n += 1
            out = fs.create(
              new Path(dirStr, f"crawl-$shard%05d.warc"), true)
            out.write(record("warcinfo", f"urn:graft:info:$shard%05d",
              "", "application/warc-fields", infoPayload(shard)))
          }
          out.write(record("response", f"urn:graft:resp:$sid%012d",
            u, "text/html", bytes))
          n
        }
        var last = 0L
        try { while (done.hasNext) last = done.next() }
        finally { close(); if (cur != Long.MinValue) fs.close() }
        Iterator.single(last)
      }.reduce(_ + _)
  }

  /** Read every `*.warc` under `dir` back to (record_id, warc_type,
    * target_uri, n_bytes, payload) rows — whole-file binary scan,
    * shards parse in parallel, records never cross task boundaries.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    parse(spark.read.format("binaryFile").load(s"$dir/*.warc"))

  /** Range-pruned read of `response` records with ids in
    * [loId, hiId): shard files prune BY NAME (the container layout is
    * the index), the residual id filter applies inside boundary
    * shards, and `warcinfo` records — which carry no sample id — are
    * excluded by construction.
    */
  def readRange(spark: SparkSession, dir: String, docsPerShard: Long,
      loId: Long, hiId: Long): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    def none = read(spark, dir).filter(lit(false))
    if (hiId <= loId) return none
    val loShard = math.floorDiv(loId, docsPerShard)
    val hiShard = math.floorDiv(hiId - 1, docsPerShard)
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = Option(fs.globStatus(new Path(dir, "crawl-*.warc")))
      .getOrElse(Array.empty)
      .map(_.getPath)
      .filter(_.getName.matches("crawl-\\d+\\.warc"))
      .filter { p =>
        val s = p.getName.stripPrefix("crawl-").stripSuffix(".warc")
          .toLong
        s >= loShard && s <= hiShard
      }
      .map(_.toString).sorted
    if (files.isEmpty) return none
    parse(spark.read.format("binaryFile").load(files.toIndexedSeq: _*))
      .filter(col("warc_type") === "response" &&
        expr("CAST(substring(record_id, 16, 12) AS BIGINT)")
          .between(loId, hiId - 1))
  }

  private def headerEnd(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < bytes.length) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def parse(warcs: DataFrame): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, String, Long, Array[Byte])]
        var off = 0
        while (off < bytes.length) {
          val he = headerEnd(bytes, off)
          require(he >= 0, s"truncated WARC header in $path at $off")
          val head = new String(bytes, off, he - off, US_ASCII)
          val lines = head.split("\r\n", -1)
          require(lines.head == "WARC/1.0",
            s"bad WARC version line in $path at $off: '${lines.head}'")
          val hs = lines.tail.map { l =>
            val i = l.indexOf(':')
            require(i > 0, s"malformed WARC header in $path at $off: '$l'")
            l.substring(0, i).toLowerCase(java.util.Locale.ROOT) ->
              l.substring(i + 1).trim
          }.toMap
          val len = hs.getOrElse("content-length",
            throw new IllegalArgumentException(
              s"missing Content-Length in $path at $off")).toLong
          val body = he + 4
          require(body + len + 4 <= bytes.length,
            s"truncated WARC payload in $path at $off")
          val payload = java.util.Arrays.copyOfRange(
            bytes, body, body + len.toInt)
          require(bytes(body + len.toInt) == '\r' &&
            bytes(body + len.toInt + 1) == '\n' &&
            bytes(body + len.toInt + 2) == '\r' &&
            bytes(body + len.toInt + 3) == '\n',
            s"missing WARC record separator in $path at $off")
          out += ((hs.getOrElse("warc-record-id", "")
              .stripPrefix("<").stripSuffix(">"),
            hs.getOrElse("warc-type", ""),
            hs.getOrElse("warc-target-uri", ""), len, payload))
          off = body + len.toInt + 4
        }
        out.iterator
      }
      .toDF("record_id", "warc_type", "target_uri", "n_bytes",
        "payload")
  }
}
