package graft.ops

import java.nio.charset.StandardCharsets.{US_ASCII, UTF_8}

import graft.sources.HadoopConfBox
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style shard container: training samples packed into
  * plain POSIX ustar tar archives, N samples per shard — the standard
  * on-disk unit a multimodal training loader streams sequentially
  * (shards shuffle as whole files; samples inside a shard read in
  * order, no random I/O). Reference format: the POSIX.1-1988 ustar
  * layout (512-byte header, name / octal size / checksum fields,
  * payload zero-padded to the 512 boundary, two zero blocks at EOF) —
  * public knowledge, implemented from the spec.
  *
  * Scale shape: shard assignment is `id / docsPerShard` (contiguous
  * ranges — the WebDataset convention, so a reader can seek a sample
  * range by shard name alone), one hash shuffle on the shard id plus
  * an intra-partition sort; each shard is streamed to its tar by the
  * partition that owns it — shard size is the only per-task memory
  * bound (one sample buffered at a time), nothing collects to the
  * driver. The byte-level writer/parser pair lives at the sanctioned
  * `mapPartitions` codec seam (a container codec is not a Catalyst
  * expression, same ruling as [[Multimodal.decodePartitioned]]).
  */
object TarShards {

  private val Block = 512

  /** One ustar header block for `name` with `size` payload bytes. */
  private[ops] def header(name: String, size: Long): Array[Byte] = {
    require(name.getBytes(UTF_8).length <= 100, s"tar name too long: $name")
    require(size >= 0, "negative payload")
    val h = new Array[Byte](Block)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes(US_ASCII); System.arraycopy(b, 0, h, off, b.length)
    }
    put(0, name)                                   // name[100]
    put(100, "0000644\u0000")                      // mode[8]
    put(108, "0000000\u0000")                      // uid[8]
    put(116, "0000000\u0000")                      // gid[8]
    put(124, f"$size%011o" + " ")                  // size[12], octal
    put(136, "00000000000 ")                       // mtime[12] (epoch: deterministic bytes)
    put(148, "        ")                           // chksum[8] = spaces while summing
    h(156) = '0'                                   // typeflag: regular file
    put(257, "ustar\u000000")                 // magic[6] + version[2]
    val sum = h.map(b => b & 0xff).sum
    put(148, f"$sum%06o" + "\u0000 ")              // chksum: 6 octal, NUL, space
    h
  }

  private def padTo(n: Int): Int = (Block - n % Block) % Block

  /** Pack (id, payload) rows into `dir/shard-NNNNN.tar`, sample name
    * `<id padded to 12>.<ext>`, `docsPerShard` consecutive ids per
    * shard. Returns the shard count. Deterministic: same rows → same
    * bytes, any partitioning. The sink streams through the Hadoop
    * FileSystem API (session conf shipped to tasks via
    * [[graft.sources.HadoopConfBox]]), so `dir` may be `file:`,
    * `hdfs:` or `s3a:` — shard layout, header bytes and shuffle
    * shape are identical on every scheme.
    *
    * Ids must fit the 12-digit sample-name contract (`%012d` in the
    * name is the range-pruning index `readRange` parses back): a
    * negative id or one >= 10^12 would silently widen the name field
    * and break `substring(name, 1, 12)` parsing, so both fail loudly
    * here instead.
    */
  def write(df: DataFrame, id: String, payload: String, dir: String,
      docsPerShard: Long, ext: String = "txt"): Long = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val confBox =
      new HadoopConfBox(spark.sessionState.newHadoopConf())
    val base = new Path(dir)
    base.getFileSystem(confBox.value).mkdirs(base)
    val dirStr = dir
    val assigned = df
      .select(col(id).cast("long").as("id"),
        col(payload).cast("binary").as("p"))
      .withColumn("shard", expr(s"id div $docsPerShard"))
    val nShards = assigned
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "id")
      .select(col("shard"), col("id"), col("p"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { it =>
        // the codec seam: stream each shard's samples into its tar,
        // one sample buffered at a time. A PRIVATE FS instance (not
        // the process-wide cache) lets us disable client-side .crc
        // sidecars — the tar file IS the artifact, its own per-entry
        // checksums are the integrity story, and a sidecar would leak
        // into directory listings; on hdfs:/s3a: the flag is a no-op.
        lazy val fs = {
          val f = FileSystem.newInstance(
            new Path(dirStr).toUri, confBox.value)
          f.setWriteChecksum(false)
          f
        }
        var out: java.io.OutputStream = null
        var cur = Long.MinValue
        var n = 0L
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](2 * Block)) // EOF: two zero blocks
          out.close(); out = null
        }
        val done = it.map { case (shard, sid, bytes) =>
          require(sid >= 0L && sid < 1000000000000L,
            s"sample id $sid outside the 12-digit name contract " +
              "[0, 1e12) — the shard name range index would corrupt")
          if (shard != cur) {
            close(); cur = shard; n += 1
            out = fs.create(
              new Path(dirStr, f"shard-$shard%05d.tar"), true)
          }
          out.write(header(f"$sid%012d.$ext", bytes.length.toLong))
          out.write(bytes)
          out.write(new Array[Byte](padTo(bytes.length)))
          n
        }
        var last = 0L
        try { while (done.hasNext) last = done.next() }
        finally { close(); if (cur != Long.MinValue) fs.close() }
        Iterator.single(last)
      }.reduce(_ + _)
    nShards
  }

  /** Read every `*.tar` under `dir` back to (name, n_bytes, payload)
    * rows — one whole-file binary scan, shards parse in parallel, and
    * a sample never crosses a task boundary (the container guarantees
    * it). A malformed header (bad magic or checksum) fails loudly:
    * silent tail-truncation is how shard corruption hides.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    parse(spark.read.format("binaryFile").load(s"$dir/*.tar"))

  /** Range-pruned shard read: because shard `s` holds exactly ids
    * [s·docsPerShard, (s+1)·docsPerShard), an id-range predicate
    * prunes FILES by name before any byte is opened — the container
    * layout is the partition-pruning index, the 100 TB difference
    * between touching 2 shards and scanning 400 000. The residual
    * filter still applies inside the boundary shards. `loId`
    * inclusive, `hiId` exclusive.
    */
  def readRange(spark: SparkSession, dir: String, docsPerShard: Long,
      loId: Long, hiId: Long): DataFrame = {
    require(docsPerShard > 0, "docsPerShard must be positive")
    if (hiId <= loId) return read(spark, dir).filter(lit(false))
    val loShard = math.floorDiv(loId, docsPerShard)
    val hiShard = math.floorDiv(hiId - 1, docsPerShard)
    // driver-side listing through the Hadoop FileSystem API, not
    // java.io.File — on hdfs:/s3a: a local File probe returns null
    // and the prune silently empties (the IngestGate round-6 bug
    // class). globStatus narrows to shard files; the name filter
    // applies the range index.
    val fs = new Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val files = Option(fs.globStatus(new Path(dir, "shard-*.tar")))
      .getOrElse(Array.empty)
      .map(_.getPath)
      .filter(_.getName.matches("shard-\\d+\\.tar"))
      .filter { p =>
        val s = p.getName.stripPrefix("shard-").stripSuffix(".tar").toLong
        s >= loShard && s <= hiShard
      }
      .map(_.toString).sorted
    if (files.isEmpty) return read(spark, dir).filter(lit(false))
    parse(spark.read.format("binaryFile").load(files.toIndexedSeq: _*))
      .filter(expr("CAST(substring(name, 1, 12) AS BIGINT)")
        .between(loId, hiId - 1))
  }

  private def parse(tars: DataFrame): DataFrame = {
    val spark = tars.sparkSession
    import spark.implicits._
    tars
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Array[Byte])]
        var off = 0
        var eof = false
        while (!eof && off + Block <= bytes.length) {
          val hdr = java.util.Arrays.copyOfRange(bytes, off, off + Block)
          if (hdr.forall(_ == 0)) { eof = true }
          else {
            val magic = new String(hdr, 257, 5, US_ASCII)
            require(magic == "ustar", s"bad tar magic in $path at $off")
            val stored = new String(hdr, 148, 8, US_ASCII)
              .takeWhile(c => c >= '0' && c <= '7')
            java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
            val sum = hdr.map(b => b & 0xff).sum
            require(java.lang.Long.parseLong(stored, 8) == sum,
              s"tar checksum mismatch in $path at $off")
            val name = new String(hdr.slice(0, 100).takeWhile(_ != 0), US_ASCII)
            val size = java.lang.Long.parseLong(
              new String(hdr, 124, 12, US_ASCII).trim.takeWhile(_ != 0), 8)
            val data = java.util.Arrays.copyOfRange(
              bytes, off + Block, off + Block + size.toInt)
            out += ((name, size, data))
            off += Block + size.toInt + padTo(size.toInt)
          }
        }
        // a well-formed archive ends in a zero block we actually saw;
        // exiting on length means the tail was cut mid-entry
        require(eof, s"truncated tar (no EOF block) in $path at $off")
        out.iterator
      }.toDF("name", "n_bytes", "payload")
  }
}
