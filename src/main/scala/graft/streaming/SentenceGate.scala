package graft.streaming

import graft.functions.GraftFunctions.portableHash
import graft.ops.Sentences
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming CCNet sentence-frequency gate —
  * [[graft.ops.Sentences.stripBoilerplate]] recast incrementally:
  * each micro-batch's documents are segmented, every sentence's
  * distinct-document frequency over EVERYTHING SEEN SO FAR (standing
  * state plus the current batch) is computed, and sentences at or
  * above `maxDocs` are stripped before the batch's cleaned texts are
  * emitted. A cookie banner that enters the corpus in batch 3 and
  * crosses the frequency floor in batch 9 starts vanishing from
  * batch 9's documents onward — exactly the online form of the
  * batch operator's verdict.
  *
  * Batch and stream agree BY CONSTRUCTION: the gate segments with
  * the same [[Sentences.sentencesOf]] and counts per-document
  * distinct occurrences the way the batch op does
  * (doc_sentence_gate_e2e pins the two-batch composition against a
  * SQL re-statement of both batches).
  *
  * State layout under `stateDir` (the [[IngestGate]]/[[SpanGate]]
  * conventions — overwrite-idempotent Hive partitions, `batch < n`
  * replay guard, META-committed h-bucketed base, vacuum):
  * {{{
  *   counts/batch=<n>/    (h, nd): per-sentence-hash distinct-doc
  *                        count contributed by batch n — 16 bytes a
  *                        sentence, NO text ever persists in state
  *   base/gen=<g>/        compacted counts bucketed by h (nd summed)
  *   base/META            "<gen> <upTo>" — compaction commit point
  *   verdicts/batch=<n>/  (doc_id, n_sentences, n_kept, n_dropped,
  *                        text_kept)
  * }}}
  *
  * Counting is by SIGHT, not admission: every seen document's
  * sentences count toward the floor whether or not earlier batches
  * stripped them — frequency is evidence of boilerplate, and a
  * sentence does not stop being boilerplate because the gate already
  * strips it. Hash collisions (portableHash mod ~1e9) conflate two
  * sentences' counts — conservative for a strip decision and shared
  * verbatim by the oracle twin.
  *
  * Scale shape: per batch, one segmentation pass over the BATCH only
  * (the corpus never re-segments), one batch-local distinct count,
  * one semi-join-pruned probe of the standing counts (base side
  * h-bucketed after [[compact]], so the big side scans without an
  * Exchange), and a boiler-domain-sized anti-join for the strip.
  */
final class SentenceGate(spark: SparkSession, stateDir: String,
    maxDocs: Long = 10L, numBuckets: Int = 32) {
  require(maxDocs >= 2L, s"need maxDocs >= 2, got $maxDocs")

  private val countsDir = s"$stateDir/counts"
  private val verdictsDir = s"$stateDir/verdicts"
  private val baseDir = s"$stateDir/base"
  private val metaPath = s"$baseDir/META"

  private val countSchema = StructType(Seq(
    StructField("h", LongType), StructField("nd", LongType)))

  private def fs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def listIds(dir: String, prefix: String): Seq[Long] = {
    val (f, p) = fs(dir)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toLong)
  }

  private def readBaseMeta(): (Long, Long) = {
    val (f, _) = fs(baseDir)
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (!f.exists(mp)) (0L, 0L)
    else {
      val in = f.open(mp)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      val Array(g, u) = txt.split(" ")
      (g.toLong, u.toLong)
    }
  }

  private def writeBaseMeta(gen: Long, upTo: Long): Unit = {
    val (f, _) = fs(baseDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$metaPath.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$gen $upTo".getBytes("UTF-8")) finally out.close()
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (f.exists(mp)) f.delete(mp, false)
    require(f.rename(tmp, mp), s"could not commit $metaPath")
  }

  private def baseTableName(gen: Long): String =
    s"graft_sentgate_base_${math.abs(stateDir.hashCode.toLong)}_g$gen"

  private def genPath(gen: Long): String = s"$baseDir/gen=$gen"

  private def baseTable(gen: Long): DataFrame = {
    val tbl = baseTableName(gen)
    if (!spark.catalog.tableExists(tbl))
      spark.sql(
        s"""CREATE TABLE $tbl (h BIGINT, nd BIGINT, batch BIGINT)
           |USING PARQUET
           |CLUSTERED BY (h) SORTED BY (h) INTO $numBuckets BUCKETS
           |LOCATION '${genPath(gen)}'""".stripMargin)
    spark.table(tbl)
  }

  /** Fold count partitions strictly below min(max id, currentBatchId)
    * into the next h-bucketed base generation, SUMMING nd per hash
    * (the [[IngestGate]] compaction contract: newest partition never
    * folds; META rename commits; idempotent; min(batch) keeps the
    * `batch < n` replay filter monotone across folds).
    */
  def compact(currentBatchId: Long = Long.MaxValue): Long = {
    val ids = listIds(countsDir, "batch=")
    val (gen, upTo) = readBaseMeta()
    if (ids.isEmpty) return upTo
    val newUpTo = math.min(ids.max, currentBatchId)
    val fold = ids.filter(i => i >= upTo && i < newUpTo).sorted
    if (fold.isEmpty) return upTo
    val foldDf = spark.read.option("basePath", countsDir)
      .parquet(fold.map(i => s"$countsDir/batch=$i"): _*)
      .select(col("h"), col("nd"), col("batch").cast("long").as("batch"))
    val all = if (gen > 0L) baseTable(gen).unionByName(foldDf) else foldDf
    val newGen = gen + 1
    val tbl = baseTableName(newGen)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (f, _) = fs(baseDir)
    f.delete(new org.apache.hadoop.fs.Path(genPath(newGen)), true)
    all.groupBy("h").agg(sum(col("nd")).as("nd"),
        min(col("batch")).as("batch"))
      .write.format("parquet")
      .bucketBy(numBuckets, "h").sortBy("h")
      .option("path", genPath(newGen))
      .saveAsTable(tbl)
    writeBaseMeta(newGen, newUpTo)
    newUpTo
  }

  /** Reclaim unreachable state: folded count dirs, dirs beyond the
    * committed high-water mark, superseded base generations.
    */
  def vacuum(currentBatchId: Long): Int = {
    val (gen, upTo) = readBaseMeta()
    var removed = 0
    def rm(dir: String): Unit = {
      val (f, p) = fs(dir)
      if (f.exists(p)) { f.delete(p, true); removed += 1 }
    }
    listIds(countsDir, "batch=")
      .filter(i => i < upTo || i > currentBatchId)
      .foreach(i => rm(s"$countsDir/batch=$i"))
    listIds(verdictsDir, "batch=")
      .filter(_ > currentBatchId)
      .foreach(i => rm(s"$verdictsDir/batch=$i"))
    listIds(baseDir, "gen=").filter(_ != gen).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${baseTableName(g)}")
      rm(genPath(g))
    }
    removed
  }

  /** Standing (h, nd) contributions from batches strictly before
    * `batchId`: the compacted base plus not-yet-folded recent
    * partitions. May hold several rows per h (one per unfolded
    * batch) — callers sum AFTER probe-pruning. Empty first batch.
    */
  def standingCounts(batchId: Long): DataFrame = {
    val (gen, upTo) = readBaseMeta()
    val base =
      if (gen > 0L) Some(baseTable(gen).filter(col("batch") < batchId)
        .select("h", "nd"))
      else None
    val recentIds = listIds(countsDir, "batch=")
      .filter(i => i >= upTo && i < batchId)
    val recent =
      if (recentIds.nonEmpty)
        Some(spark.read.option("basePath", countsDir).parquet(countsDir)
          .filter(col("batch") >= upTo && col("batch") < batchId)
          .select("h", "nd"))
      else None
    (base.toSeq ++ recent.toSeq) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countSchema)
      case srcs => srcs.reduce(_ unionByName _)
    }
  }

  /** Gate one micro-batch of (doc_id, text): write per-doc verdicts
    * (order-preserving `text_kept` with the over-floor sentences
    * stripped) and the batch's per-hash distinct-doc counts under
    * `batch=<batchId>`. Idempotent per batchId (partition
    * overwrite). A document stripped to nothing emits an empty
    * `text_kept`, never disappears.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val b = batch.dropDuplicates("doc_id")
    val ex = b.select(col("doc_id"),
        posexplode(Sentences.sentencesOf(col("text")))
          .as(Seq("pos", "s")))
      .withColumn("h", portableHash(col("s")))
    ex.persist()
    try {
      val batchCounts = ex.select(col("doc_id"), col("h")).distinct()
        .groupBy("h").agg(count(lit(1)).as("nd"))
      batchCounts.persist()
      // probe-pruned standing sum: the semi-join keeps the bucketed
      // base side Exchange-free and the re-aggregation batch-sized
      val prior = standingCounts(batchId)
        .join(batchCounts.select("h"), Seq("h"), "left_semi")
        .groupBy("h").agg(sum(col("nd")).as("__prior"))
      val boiler = batchCounts.join(prior, Seq("h"), "left")
        .filter(col("nd") + coalesce(col("__prior"), lit(0L)) >= maxDocs)
        .select("h")
      val kept = ex.join(boiler, Seq("h"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x.getField("s")), " ").as("text_kept"))
      val totals = ex.groupBy("doc_id")
        .agg(count(lit(1)).as("__n"))
      val verdicts = b.select(col("doc_id"))
        .join(totals, Seq("doc_id"), "left")
        .join(kept, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("__n"), lit(0L)).as("n_sentences"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (coalesce(col("__n"), lit(0L)) -
            coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
          coalesce(col("text_kept"), lit("")).as("text_kept"))
      verdicts.write.mode("overwrite")
        .parquet(s"$verdictsDir/batch=$batchId")
      batchCounts.write.mode("overwrite")
        .parquet(s"$countsDir/batch=$batchId")
      batchCounts.unpersist()
      ()
    } finally ex.unpersist()
  }

  /** Production wiring: drive the gate from a streaming source via
    * foreachBatch, with optional in-loop maintenance every n batches
    * (the [[SpanGate.start]] contract — maintenance runs AFTER the
    * batch's writes with `currentBatchId = id`).
    */
  def start(docs: DataFrame, checkpointDir: String,
      compactEvery: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id)
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          compact(currentBatchId = id)
          vacuum(currentBatchId = id)
        }
        ()
      }
      .start()

  /** Verdicts of batches <= upTo (replay-guard filtered). */
  def readVerdicts(upTo: Long): DataFrame =
    spark.read.option("basePath", verdictsDir).parquet(verdictsDir)
      .filter(col("batch") <= upTo)
      .select(col("doc_id"), col("batch").cast("long").as("batch"),
        col("n_sentences"), col("n_kept"), col("n_dropped"),
        col("text_kept"))
}
