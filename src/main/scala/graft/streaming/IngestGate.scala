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
  * State layout under `stateDir` (both Hive-partitioned by the
  * micro-batch id):
  * {{{
  *   corpus/batch=<n>/    admitted docs' band rows
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
  * stored index, and a small batch side broadcasts under AQE. At
  * 100 TB the batch=... partitions should be periodically compacted
  * and bucketed by `band_key` so the probe join is co-located; the
  * per-batch layout here keeps replay idempotence simple and is the
  * honest small-scale twin of that.
  */
final class IngestGate(spark: SparkSession, stateDir: String,
    k: Int = 16, rowsPerBand: Int = 8, threshold: Double = 0.95) {

  private val corpusDir = s"$stateDir/corpus"
  private val verdictsDir = s"$stateDir/verdicts"

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

  /** Corpus band rows admitted by batches strictly before `batchId`
    * (empty on the first batch / a fresh state dir). The existence
    * probe goes through the Hadoop FileSystem of the path — a
    * java.io.File check would silently report an hdfs:// or s3a://
    * state dir as absent and admit every duplicate.
    */
  def corpusBands(batchId: Long): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatches = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (hasBatches)
      spark.read.option("basePath", corpusDir).parquet(corpusDir)
        .filter(col("batch") < batchId)
        .select("doc_id", "hs", "band_key")
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        bandSchema)
  }

  /** Admit one micro-batch: write verdicts and the survivors' band
    * rows under `batch=<batchId>`. Idempotent per batchId.
    */
  def applyBatch(batch: DataFrame, batchId: Long): Unit = {
    val sets = batch.select(col("doc_id"),
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
    val corpDup = Dedup.incrementalNearDupBands(
      corpusBands(batchId), probe, "doc_id", threshold)
      .persist()
    try { applyBatchWrites(batch, batchId, inDup, corpDup, probe) }
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

  /** Start the gate over a streaming `(doc_id, text)` frame. */
  def start(docs: DataFrame, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: DataFrame, id: Long) => applyBatch(b, id))
      .start()
}
