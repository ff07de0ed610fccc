package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming near-dup ingest gate: the production composition of
  * [[graft.ops.Dedup.incrementalNearDup]]. Each micro-batch of
  * documents is (1) self-deduplicated greedily within the batch
  * (drop any doc with a verified smaller-id near-dup in the same
  * batch), (2) probed against the STANDING corpus band index, and
  * (3) survivors are admitted — their `(id, hs, band_key)` band rows
  * become corpus state for every later batch. A per-doc verdict
  * (`admitted` / `dup_in_batch` / `dup_of_corpus`) is emitted.
  *
  * State layout under `stateDir`:
  * {{{
  *   corpus/batch=<n>/    admitted docs' band rows (recent batches)
  *   base/gen=<g>/        compacted band index: one band_key-bucketed
  *                        table folding every batch below the META
  *                        watermark (written by [[compact]])
  *   base/META            "<gen> <upTo>" — the compaction commit point
  *   verdicts/batch=<n>/  (doc_id, verdict, dup_of, best_jac)
  * }}}
  * Effectively-once without a manifest: a replayed batch OVERWRITES
  * its own partition directories, and the corpus read for batch n
  * filters `batch < n` — a half-written previous attempt is neither
  * probed against itself nor double-counted. (Contrast with the CDC
  * engine's [[graft.sink.TransactionalStore]], which needs a real
  * manifest because its tables are merged, not append-only.)
  *
  * Scale shape: the corpus is never re-signatured — each batch costs
  * one pass over the batch plus a band-key equi-join against the
  * stored index, and a small batch side broadcasts under AQE. Without
  * maintenance the standing index grows one Hive partition per batch
  * forever and the probe re-shuffles all of it every batch; [[compact]]
  * is that maintenance: it folds every batch below the current
  * high-water mark into a `base/gen=<g>` table BUCKETED by `band_key`
  * (registered in the session catalog), so the big corpus side of the
  * probe join is a bucket-pruned scan with NO Exchange — only the
  * small batch side shuffles (plan-checked in IngestGateSpec). The
  * newest batch partition is never folded, keeping the overwrite
  * replay guard sound: only a batch that can still be replayed keeps
  * its own directory. Orphans (crashed attempts beyond the committed
  * high-water mark, superseded generations, folded batch dirs) are
  * reclaimed by [[vacuum]].
  */
final class IngestGate(spark: SparkSession, stateDir: String,
    k: Int = 16, rowsPerBand: Int = 8, threshold: Double = 0.95,
    numBuckets: Int = 64, probeCap: Int = IngestGate.DefaultProbeCap) {

  private val corpusDir = s"$stateDir/corpus"
  private val verdictsDir = s"$stateDir/verdicts"
  private val baseDir = s"$stateDir/base"
  private val metaPath = s"$baseDir/META"

  /** Per-batch admission counters, observed on the verdicts write
    * itself (no extra job — the EngineMetrics pattern).
    */
  final case class GateStats(batchId: Long, nAdmitted: Long,
      nDupInBatch: Long, nDupCorpus: Long)

  @volatile private var lastStatsVar: Option[GateStats] = None
  def lastStats: Option[GateStats] = lastStatsVar

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("hs", ArrayType(LongType)),
    StructField("band_key", StringType)))

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

  /** (generation, upTo): the compacted base covers batches < upTo.
    * (0, 0) before the first compaction.
    */
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
    // rename-swap commit (atomic on HDFS/local; an object-store
    // deployment swaps this for a conditional put, like the CDC
    // manifest head)
    val mp = new org.apache.hadoop.fs.Path(metaPath)
    if (f.exists(mp)) f.delete(mp, false)
    require(f.rename(tmp, mp), s"could not commit $metaPath")
  }

  /** Catalog name of a base generation's bucketed table — derived
    * from the state dir so two gates in one session never collide.
    */
  private def baseTableName(gen: Long): String =
    s"graft_gate_base_${math.abs(stateDir.hashCode.toLong)}_g$gen"

  private def genPath(gen: Long): String = s"$baseDir/gen=$gen"

  /** The base generation's DataFrame, (re-)registering the external
    * bucketed table if this session's catalog has not seen it (a
    * fresh session reading existing state).
    */
  private def baseTable(gen: Long): DataFrame = {
    val tbl = baseTableName(gen)
    if (!spark.catalog.tableExists(tbl))
      spark.sql(
        s"""CREATE TABLE $tbl
           |  (doc_id BIGINT, hs ARRAY<BIGINT>, band_key STRING, batch BIGINT)
           |USING PARQUET
           |CLUSTERED BY (band_key) SORTED BY (band_key) INTO $numBuckets BUCKETS
           |LOCATION '${genPath(gen)}'""".stripMargin)
    spark.table(tbl)
  }

  /** Fold every corpus batch partition strictly below the watermark
    * into the next base generation, bucketed by `band_key`. The
    * watermark is `min(max batch id present, currentBatchId)`: the
    * newest partition stays a directory — it is the only one a stream
    * restart can replay, and replay works by overwriting that
    * directory — and `currentBatchId` (the stream's committed
    * position, known to the maintenance caller) keeps an ORPHANED
    * future-id dir from a rolled-back checkpoint from inflating the
    * watermark, which would permanently hide later batch dirs from
    * the probe (`corpusSources` reads `batch >= upTo`). Idempotent and
    * crash-safe: the META rename is the commit point; a crash before
    * it leaves the old generation live (the half-written gen dir is
    * overwritten by the next attempt), a crash after it leaves folded
    * batch dirs that [[corpusBands]] ignores (base covers them) and
    * [[vacuum]] reclaims. Returns the new watermark (exclusive).
    */
  def compact(currentBatchId: Long = Long.MaxValue): Long = {
    val ids = listIds(corpusDir, "batch=")
    val (gen, upTo) = readBaseMeta()
    if (ids.isEmpty) return upTo
    val newUpTo = math.min(ids.max, currentBatchId)
    val fold = ids.filter(i => i >= upTo && i < newUpTo).sorted
    if (fold.isEmpty) return upTo
    val foldDf = spark.read.option("basePath", corpusDir)
      .parquet(fold.map(i => s"$corpusDir/batch=$i"): _*)
      .select(col("doc_id"), col("hs"), col("band_key"),
        col("batch").cast("long").as("batch"))
    val all = if (gen > 0L) baseTable(gen).unionByName(foldDf) else foldDf
    val newGen = gen + 1
    val tbl = baseTableName(newGen)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val (f, _) = fs(baseDir)
    f.delete(new org.apache.hadoop.fs.Path(genPath(newGen)), true)
    all.write.format("parquet")
      .bucketBy(numBuckets, "band_key").sortBy("band_key")
      .option("path", genPath(newGen))
      .saveAsTable(tbl)
    writeBaseMeta(newGen, newUpTo)
    newUpTo
  }

  /** Reclaim state no probe can reach: corpus batch dirs already
    * folded into the base, corpus AND verdict dirs beyond the
    * committed high-water mark `currentBatchId` (crashed attempts of
    * a rolled-back stream — the `batch < n` guard never probes them,
    * but they accumulate forever and pollute [[readVerdicts]]), and
    * superseded base generations (their catalog entries dropped too).
    * Returns the number of directories removed.
    */
  def vacuum(currentBatchId: Long): Int = {
    val (gen, upTo) = readBaseMeta()
    var removed = 0
    def rm(dir: String): Unit = {
      val (f, p) = fs(dir)
      if (f.exists(p)) { f.delete(p, true); removed += 1 }
    }
    listIds(corpusDir, "batch=")
      .filter(i => i < upTo || i > currentBatchId)
      .foreach(i => rm(s"$corpusDir/batch=$i"))
    listIds(verdictsDir, "batch=")
      .filter(_ > currentBatchId)
      .foreach(i => rm(s"$verdictsDir/batch=$i"))
    listIds(baseDir, "gen=").filter(_ != gen).foreach { g =>
      spark.sql(s"DROP TABLE IF EXISTS ${baseTableName(g)}")
      rm(genPath(g))
    }
    removed
  }

  /** The compacted base index, if a compaction has committed — the
    * band_key-bucketed big side of the probe join (plan-checked in
    * IngestGateSpec to join without a corpus-side Exchange).
    */
  def baseIndex(): Option[DataFrame] = {
    val (gen, _) = readBaseMeta()
    if (gen > 0L) Some(baseTable(gen)) else None
  }

  /** The corpus sides batch `batchId` must probe, as SEPARATE frames:
    * the compacted base (bucketed on `band_key` — joins against it
    * need no corpus-side Exchange) and the not-yet-folded recent batch
    * partitions. Probing them separately and merging verdicts keeps
    * the bucketed side's scan-without-shuffle property — a union would
    * erase the bucketing for the whole join. Empty when the corpus has
    * no prior admitted batch.
    */
  private def corpusSources(batchId: Long): Seq[DataFrame] = {
    val (gen, upTo) = readBaseMeta()
    val base =
      if (gen > 0L)
        Some(baseTable(gen).filter(col("batch") < batchId)
          .select("doc_id", "hs", "band_key"))
      else None
    val recentIds = listIds(corpusDir, "batch=")
      .filter(i => i >= upTo && i < batchId)
    val recent =
      if (recentIds.nonEmpty)
        Some(spark.read.option("basePath", corpusDir).parquet(corpusDir)
          .filter(col("batch") >= upTo && col("batch") < batchId)
          .select("doc_id", "hs", "band_key"))
      else None
    base.toSeq ++ recent.toSeq
  }

  /** Corpus band rows admitted by batches strictly before `batchId`
    * (empty on the first batch / a fresh state dir) — the union view
    * over [[corpusSources]], for callers that want the whole index.
    */
  def corpusBands(batchId: Long): DataFrame =
    corpusSources(batchId) match {
      case Nil => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)
      case srcs => srcs.reduce(_ unionByName _)
    }

  /** Probe every corpus source and merge the per-source verdicts:
    * `dup_of` is the global min matching corpus id and `best_jac` the
    * global max, so the split-probe is row-identical to probing the
    * union (min/max are associative) — IngestGateSpec pins this across
    * a compaction. With a finite `probeCap` the heavy-band hub
    * collapse applies PER SOURCE (a band heavy only across the union
    * stays exact — the guard is a bound on per-source fan-out, and
    * compaction folds sources together over time anyway).
    */
  private def corpusDupVerdicts(batchId: Long, probe: DataFrame): DataFrame =
    corpusSources(batchId) match {
      case Nil => Dedup.incrementalNearDupBands(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema),
        probe, "doc_id", threshold, probeCap)
      case Seq(one) =>
        Dedup.incrementalNearDupBands(one, probe, "doc_id", threshold,
          probeCap)
      case srcs =>
        srcs.map(c =>
          Dedup.incrementalNearDupBands(c, probe, "doc_id", threshold,
            probeCap))
          .reduce(_ unionByName _)
          .groupBy("doc_id")
          .agg(min("dup_of").as("dup_of"), max("best_jac").as("best_jac"))
    }

  /** Admit one micro-batch: write verdicts and the survivors' band
    * rows under `batch=<batchId>`. Idempotent per batchId. Repeated
    * doc_ids within the batch are collapsed first (keeping one row):
    * the strict `id_a < id_b` pair order means identical ids never
    * pair, so without the guard BOTH copies would be admitted and the
    * corpus index would double-count their band rows.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val b = batch.dropDuplicates("doc_id")
    val sets = b.select(col("doc_id"),
      Dedup.tokenHashSet(col("text")).as("hs"))
    // bands and both verdict frames feed TWO actions (the verdicts
    // write and the survivors write) — persist so the tokenize/
    // MinHash/pair-join/corpus-probe lineage runs once per batch,
    // not once per write
    val bands = Dedup.bandTable(sets, "doc_id", "hs", k, rowsPerBand)
      .persist()
    // greedy in-batch self-dedup: a doc with ANY verified smaller-id
    // partner in the same batch is dropped (what a production gate
    // does — full transitive clustering per micro-batch buys little
    // and costs an iterative job)
    val inDup = Dedup.minhashNearDupPairs(sets, "doc_id", "hs",
      k, rowsPerBand, threshold)
      .groupBy(col("id_b").as("doc_id"))
      .agg(min("id_a").as("dup_of"), max("jac").as("best_jac"))
      .persist()
    val probe = bands.join(inDup.select("doc_id"), Seq("doc_id"), "left_anti")
    val corpDup = corpusDupVerdicts(batchId, probe).persist()
    try { applyBatchWrites(b, batchId, inDup, corpDup, probe) }
    finally { bands.unpersist(); inDup.unpersist(); corpDup.unpersist() }
  }

  private def applyBatchWrites(batch: DataFrame, batchId: Long,
      inDup: DataFrame, corpDup: DataFrame, probe: DataFrame): Unit = {
    val verdicts = batch.select(col("doc_id"))
      .join(inDup.withColumnRenamed("dup_of", "dup_in")
        .withColumnRenamed("best_jac", "jac_in"), Seq("doc_id"), "left")
      .join(corpDup.withColumnRenamed("dup_of", "dup_corp")
        .withColumnRenamed("best_jac", "jac_corp"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("dup_in").isNotNull, lit("dup_in_batch"))
          .when(col("dup_corp").isNotNull, lit("dup_of_corpus"))
          .otherwise(lit("admitted")).as("verdict"),
        coalesce(col("dup_in"), col("dup_corp")).as("dup_of"),
        coalesce(col("jac_in"), col("jac_corp")).as("best_jac"))
    val survivors = probe.join(
      corpDup.select("doc_id"), Seq("doc_id"), "left_anti")
    // verdicts first: a crash between the writes leaves a replayable
    // batch (corpus filter excludes the partial partition), never a
    // corpus row without its verdict
    val obs = org.apache.spark.sql.Observation(
      s"gate-$batchId-${System.nanoTime()}")
    // coalesce: sum over an EMPTY batch is null, not 0
    def cnt(v: String) =
      coalesce(sum(when(col("verdict") === v, 1L).otherwise(0L)), lit(0L)).as(v)
    verdicts.observe(obs, cnt("admitted"), cnt("dup_in_batch"),
        cnt("dup_of_corpus"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$verdictsDir/batch=$batchId")
    val m = obs.get
    lastStatsVar = Some(GateStats(batchId,
      m("admitted").asInstanceOf[Long],
      m("dup_in_batch").asInstanceOf[Long],
      m("dup_of_corpus").asInstanceOf[Long]))
    survivors.write.mode("overwrite")
      .parquet(s"$corpusDir/batch=$batchId")
  }

  /** All verdicts so far, with the `batch` partition column. */
  def readVerdicts(): DataFrame =
    spark.read.option("basePath", verdictsDir).parquet(verdictsDir)

  /** Start the gate over a streaming `(doc_id, text)` frame.
    *
    * `compactEvery = n` runs the maintenance pass ([[compact]] +
    * [[vacuum]]) inside the micro-batch loop after every n-th batch —
    * the production wiring, so the standing index never degrades into
    * unbounded per-batch partitions without an operator remembering
    * to schedule maintenance out of band. The pass runs AFTER the
    * batch's own writes with `currentBatchId = id`: the newest batch
    * dir always survives for replay, and a restart that re-runs batch
    * id re-runs an idempotent compaction (the META rename commits,
    * folded dirs are ignored by the probe either way). 0 disables.
    */
  def start(docs: DataFrame, checkpointDir: String,
      compactEvery: Int = 0): StreamingQuery =
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
}

object IngestGate {
  /** Finite by default (matching [[graft.ops.CurationPipeline]]'s
    * convention — cap at the production entry): a directly-constructed
    * gate routes heavy bands through the star-collapse guard instead
    * of silently inheriting an unbounded O(m²) band probe. Oracle
    * constructions that need exact semantics pass an explicit
    * `probeCap = Int.MaxValue`.
    */
  val DefaultProbeCap: Int = 32
}
