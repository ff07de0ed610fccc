package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming SUBSTRING-dedup ingest gate — [[graft.ops.Dedup.dupSpans]]
  * recast incrementally: each micro-batch of documents is scored for
  * duplicated-span coverage against (a) the STANDING corpus of
  * admitted documents' window hashes and (b) itself (a window
  * repeated within the batch, including within one document), and a
  * document whose covered-token fraction exceeds `maxDupFrac` is
  * rejected. Admitted documents' distinct window hashes become corpus
  * state for every later batch — so the standing corpus maintains the
  * invariant "no admitted document overlaps an earlier admitted one
  * by a full w-window beyond the tolerated fraction".
  *
  * Batch and stream agree on span geometry BY CONSTRUCTION: the gate
  * calls the same [[Dedup.windowHashes]] front half and
  * [[Dedup.mergeWindowSpans]] island merge the batch operator uses
  * (doc_span_gate_e2e pins the composition against a SQL re-statement
  * of both batches).
  *
  * State layout under `stateDir` (the [[IngestGate]] conventions —
  * overwrite-idempotent Hive partitions, `batch < n` replay guard,
  * META-committed bucketed base, vacuum):
  * {{{
  *   hashes/batch=<n>/    admitted docs' DISTINCT window hashes (h)
  *   base/gen=<g>/        compacted hash index bucketed by h
  *   base/META            "<gen> <upTo>" — compaction commit point
  *   verdicts/batch=<n>/  (doc_id, n_toks, dup_toks, dup_frac, admitted)
  * }}}
  *
  * Scale shape: per batch, one window explode over the BATCH only
  * (the corpus is never re-tokenized), one batch-local hash count,
  * and one membership semi-join against the stored hash index — the
  * corpus side is h-bucketed after [[compact]], so the big side of
  * the probe scans without an Exchange and only the batch side
  * shuffles. Corpus state is O(distinct windows of admitted docs) —
  * 8 bytes per window before parquet encoding.
  */
final class SpanGate(spark: SparkSession, stateDir: String,
    w: Int = 16, maxDupFrac: Double = 0.5, numBuckets: Int = 32) {
  require(w > 0 && maxDupFrac >= 0.0 && maxDupFrac <= 1.0,
    "need w > 0 and maxDupFrac in [0, 1]")

  private val hashesDir = s"$stateDir/hashes"
  private val verdictsDir = s"$stateDir/verdicts"
  private val baseDir = s"$stateDir/base"
  private val metaPath = s"$baseDir/META"

  private val hashSchema = StructType(Seq(StructField("h", LongType)))

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
    s"graft_spangate_base_${math.abs(stateDir.hashCode.toLong)}_g$gen"

  private def genPath(gen: Long): String = s"$baseDir/gen=$gen"

  private def baseTable(gen: Long): DataFrame = {
    val tbl = baseTableName(gen)
    if (!spark.catalog.tableExists(tbl))
      spark.sql(
        s"""CREATE TABLE $tbl (h BIGINT, batch BIGINT)
           |USING PARQUET
           |CLUSTERED BY (h) SORTED BY (h) INTO $numBuckets BUCKETS
           |LOCATION '${genPath(gen)}'""".stripMargin)
    spark.table(tbl)
  }

  /** Fold hash partitions strictly below min(max id, currentBatchId)
    * into the next h-bucketed base generation (the [[IngestGate]]
    * compaction contract: newest partition never folds — it is the
    * replayable one; META rename is the commit point; idempotent).
    */
  def compact(currentBatchId: Long = Long.MaxValue): Long = {
    val ids = listIds(hashesDir, "batch=")
    val (gen, upTo) = readBaseMeta()
    if (ids.isEmpty) return upTo
    val newUpTo = math.min(ids.max, currentBatchId)
    val fold = ids.filter(i => i >= upTo && i < newUpTo).sorted
    if (fold.isEmpty) return upTo
    val foldDf = spark.read.option("basePath", hashesDir)
      .parquet(fold.map(i => s"$hashesDir/batch=$i"): _*)
      .select(col("h"), col("batch").cast("long").as("batch"))
    val all = if (gen > 0L) baseTable(gen).unionByName(foldDf) else foldDf
    val newGen = gen + 1
    val tbl = baseTableName(newGen)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (f, _) = fs(baseDir)
    f.delete(new org.apache.hadoop.fs.Path(genPath(newGen)), true)
    // distinct within h-buckets: a hash admitted by two batches needs
    // one row; keep the SMALLEST batch id so `batch < n` filters stay
    // monotone across folds
    all.groupBy("h").agg(min("batch").as("batch"))
      .write.format("parquet")
      .bucketBy(numBuckets, "h").sortBy("h")
      .option("path", genPath(newGen))
      .saveAsTable(tbl)
    writeBaseMeta(newGen, newUpTo)
    newUpTo
  }

  /** Reclaim unreachable state: folded hash dirs, dirs beyond the
    * committed high-water mark, superseded base generations.
    */
  def vacuum(currentBatchId: Long): Int = {
    val (gen, upTo) = readBaseMeta()
    var removed = 0
    def rm(dir: String): Unit = {
      val (f, p) = fs(dir)
      if (f.exists(p)) { f.delete(p, true); removed += 1 }
    }
    listIds(hashesDir, "batch=")
      .filter(i => i < upTo || i > currentBatchId)
      .foreach(i => rm(s"$hashesDir/batch=$i"))
    listIds(verdictsDir, "batch=")
      .filter(_ > currentBatchId)
      .foreach(i => rm(s"$verdictsDir/batch=$i"))
    listIds(baseDir, "gen=").filter(_ != gen).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${baseTableName(g)}")
      rm(genPath(g))
    }
    removed
  }

  /** The compacted base hash index, if a compaction has committed —
    * the h-bucketed big side of the probe join.
    */
  def baseIndex(): Option[DataFrame] = {
    val (gen, _) = readBaseMeta()
    if (gen > 0L) Some(baseTable(gen)) else None
  }

  /** Distinct window hashes admitted by batches strictly before
    * `batchId`: the compacted base (h-bucketed — the probe join scans
    * it without a corpus-side Exchange) unioned with not-yet-folded
    * recent partitions. Empty on the first batch.
    */
  def corpusHashes(batchId: Long): DataFrame = {
    val (gen, upTo) = readBaseMeta()
    val base =
      if (gen > 0L) Some(baseTable(gen).filter(col("batch") < batchId)
        .select("h"))
      else None
    val recentIds = listIds(hashesDir, "batch=")
      .filter(i => i >= upTo && i < batchId)
    val recent =
      if (recentIds.nonEmpty)
        Some(spark.read.option("basePath", hashesDir).parquet(hashesDir)
          .filter(col("batch") >= upTo && col("batch") < batchId)
          .select("h"))
      else None
    (base.toSeq ++ recent.toSeq) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], hashSchema)
      case srcs => srcs.reduce(_ unionByName _)
    }
  }

  /** Admit one micro-batch of (doc_id, text): write per-doc verdicts
    * and the admitted docs' distinct window hashes under
    * `batch=<batchId>`. Idempotent per batchId (partition overwrite).
    * A document shorter than w tokens has zero windows, zero
    * duplicated coverage, and is always admitted.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val b = batch.dropDuplicates("doc_id")
    val docs = b.select(col("doc_id"),
      size(graft.functions.GraftFunctions.tokens(col("text")))
        .cast("long").as("n_toks"))
    val wins = Dedup.windowHashes(b, col("doc_id"), col("text"), w)
    wins.persist()
    try {
      // duplicated = repeated within the batch OR present in the
      // corpus. Membership via TWO semi-joins (batch side probes the
      // h-bucketed corpus; never a distinct over the corpus-sized
      // union — that would re-shuffle the whole standing hash set
      // every batch), then a batch-sized dedup of the hit positions.
      val inBatch = wins.groupBy("h").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select("h")
      val hits = wins.join(corpusHashes(batchId), Seq("h"), "left_semi")
        .unionByName(wins.join(inBatch, Seq("h"), "left_semi"))
        .select(col("id"), col("s")).distinct()
      val spans = Dedup.mergeWindowSpans(hits, w)
      val perDoc = spans.groupBy(col("id").as("doc_id"))
        .agg(sum(col("span_len_toks")).as("dup_toks"))
      val verdicts = docs
        .join(perDoc, Seq("doc_id"), "left")
        .withColumn("dup_toks", coalesce(col("dup_toks"), lit(0L)))
        .withColumn("dup_frac",
          when(col("n_toks") > 0,
            col("dup_toks").cast("double") / col("n_toks").cast("double"))
            .otherwise(lit(0.0d)))
        .withColumn("admitted", col("dup_frac") <= maxDupFrac)
      verdicts.write.mode("overwrite")
        .parquet(s"$verdictsDir/batch=$batchId")
      // admitted docs' distinct hashes become corpus state
      val admitted = spark.read.parquet(s"$verdictsDir/batch=$batchId")
        .filter(col("admitted")).select("doc_id")
      wins.join(admitted, wins("id") === admitted("doc_id"))
        .select("h").distinct()
        .write.mode("overwrite")
        .parquet(s"$hashesDir/batch=$batchId")
    } finally wins.unpersist()
  }

  /** Production wiring: drive the gate from a streaming source via
    * foreachBatch, with optional in-loop maintenance every n batches
    * (the [[IngestGate.start]] contract — maintenance runs AFTER the
    * batch's writes with `currentBatchId = id`, so the newest
    * partition always survives for replay and a restarted batch
    * re-runs an idempotent compaction).
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
        col("n_toks"), col("dup_toks"), col("dup_frac"), col("admitted"))
}
