package graft.streaming

import graft.ops.Drift
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — [[graft.ops.Drift]] recast
  * incrementally: a PINNED reference token distribution (O(buckets)
  * hashed counts, set once from a trusted corpus slice) is compared
  * against every incoming micro-batch, and each batch gets one
  * verdict row: total PSI/KL, the hot-bucket count, and the hot
  * bucket ids themselves (comma-joined — scalar-output contract).
  * This is the gate a continuously-ingesting pipeline puts in front
  * of admission: "pause this crawl source, its token distribution
  * shifted".
  *
  * Batch and stream agree BY CONSTRUCTION: the monitor prices buckets
  * through the same [[Drift.priceBuckets]] step the batch operator
  * uses (doc_drift_gate_e2e pins the composition against a SQL
  * re-statement of both batches).
  *
  * State layout under `stateDir`:
  * {{{
  *   reference/           (bucket, c_ref) — O(buckets) rows, pinned
  *   verdicts/batch=<n>/  (n_cand, psi_e9, kl_e9, n_hot_buckets,
  *                         hot_buckets)
  * }}}
  *
  * Scale shape: per batch, one token scan over the BATCH only with a
  * map-side-combined O(buckets) aggregation; the reference side is
  * O(buckets) rows read once per batch; the join is
  * skeleton × counts, never data-sized. Replay of a completed batch
  * id is a no-op (partition-exists guard), so a restarted stream
  * cannot double-write verdicts.
  */
final class DriftMonitor(spark: SparkSession, stateDir: String,
    buckets: Int = 256, hotPsiE9: Long = 100000L) {
  require(buckets >= 2, s"need buckets >= 2, got $buckets")

  private val refDir = s"$stateDir/reference"
  private val verdictsDir = s"$stateDir/verdicts"

  private def fs(dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Pin the reference distribution: hashed bucket counts of the
    * trusted slice's token stream. One scan; O(buckets) rows stored.
    */
  def setReference(df: DataFrame, text: Column): Unit =
    Drift.bucketCounts(df, text, buckets)
      .withColumnRenamed("cnt", "c_ref")
      .repartition(1)
      .write.mode("overwrite").parquet(refDir)

  /** Score one micro-batch against the pinned reference and write its
    * verdict row. Idempotent per batch id.
    */
  def applyBatch(batch: DataFrame, text: Column, batchId: Long): Unit = {
    val vDir = s"$verdictsDir/batch=$batchId"
    val (f, p) = fs(vDir)
    if (f.exists(p)) return // replay guard
    val ref = spark.read.parquet(refDir)
    val totR = ref.agg(sum("c_ref")).head().getLong(0)
    require(totR > 0, "setReference must run before applyBatch")
    val cand = Drift.bucketCounts(batch, text, buckets)
      .withColumnRenamed("cnt", "c_cand")
    val totCRow = cand.agg(sum("c_cand")).head()
    require(!totCRow.isNullAt(0) && totCRow.getLong(0) > 0,
      s"batch $batchId carries no tokens")
    val totC = totCRow.getLong(0)
    Drift.priceBuckets(ref.join(cand, Seq("bucket"), "outer"),
        totR, totC, buckets)
      .agg(
        sum("c_cand").as("n_cand"),
        sum("psi_e9").as("psi_e9"),
        sum("kl_e9").as("kl_e9"),
        sum(when(col("psi_e9") > hotPsiE9, 1L).otherwise(0L))
          .as("n_hot_buckets"),
        // numeric sort BEFORE the string cast ("10" < "2" otherwise)
        expr(s"""array_join(transform(sort_array(collect_list(
          CASE WHEN psi_e9 > ${hotPsiE9}L THEN bucket END)),
          x -> cast(x AS STRING)), ',')""").as("hot_buckets"))
      .repartition(1)
      .write.mode("overwrite").parquet(vDir)
  }

  /** All verdict rows with batch id <= `upTo` (the id rides the Hive
    * partition, not the file payload).
    */
  def readVerdicts(upTo: Long): DataFrame =
    spark.read.option("basePath", verdictsDir).parquet(verdictsDir)
      .filter(col("batch") <= upTo)
      .select(col("batch").cast("long").as("batch"), col("n_cand"),
        col("psi_e9"), col("kl_e9"), col("n_hot_buckets"),
        col("hot_buckets"))
}
