package graft.streaming

import graft.ops.{Drift, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — [[graft.ops.Drift]] recast
  * incrementally: a PINNED reference distribution (O(buckets) counts,
  * set once from a trusted corpus slice) is compared against every
  * incoming micro-batch, and each batch gets one verdict row: total
  * PSI/KL, the hot-bucket count, and the hot bucket ids themselves
  * (comma-joined — scalar-output contract). This is the gate a
  * continuously-ingesting pipeline puts in front of admission:
  * "pause this crawl source, its distribution shifted".
  *
  * All three batch modalities are covered, each priced through the
  * SAME [[Drift.priceBuckets]] step as its batch operator so the two
  * cannot drift:
  *
  *   - tokens: hashed token buckets ([[Drift.tokenBucketDrift]]'s
  *     space) via [[setReference]]/[[applyBatch]];
  *   - scores: equal-width integer bands ([[Drift.scoreDrift]]'s
  *     binning) via [[setScoreReference]]/[[applyScoreBatch]] — the
  *     band geometry (lo, binw) is pinned AT REFERENCE TIME and
  *     persisted with the reference, because a batch must never
  *     re-derive bins from itself (that would make "drift" a moving
  *     target); batch scores outside the pinned range clamp into the
  *     edge bands;
  *   - embeddings: sign-pattern LSH cells ([[Drift.embeddingDrift]]'s
  *     space, [[Similarity.lshBucket]]'s deterministic hyperplanes)
  *     via [[setEmbeddingReference]]/[[applyEmbeddingBatch]] —
  *     `buckets` must equal 2^planes.
  *
  * State layout under `stateDir`:
  * {{{
  *   reference/           (bucket, c_ref, lo, binw) — O(buckets) rows
  *   verdicts/batch=<n>/  (n_cand, psi_e9, kl_e9, n_hot_buckets,
  *                         hot_buckets)
  * }}}
  *
  * Scale shape: per batch, one scan over the BATCH only with a
  * map-side-combined O(buckets) aggregation; the reference side is
  * O(buckets) rows read once per batch; the join is
  * skeleton × counts, never data-sized. Replay of a COMMITTED batch
  * id (Spark's `_SUCCESS` marker present) is a no-op; a partial
  * directory from a mid-write crash is overwritten on restart, so a
  * half-written verdict can neither double-write nor wedge the
  * stream.
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

  // ---- token modality --------------------------------------------

  /** Pin the reference distribution: hashed bucket counts of the
    * trusted slice's token stream. One scan; O(buckets) rows stored.
    */
  def setReference(df: DataFrame, text: Column): Unit =
    writeReference(Drift.bucketCounts(df, text, buckets), lo = 0L, binw = 1L)

  /** Score one micro-batch's token stream against the pinned
    * reference and write its verdict row. Idempotent per batch id.
    */
  def applyBatch(batch: DataFrame, text: Column, batchId: Long): Unit =
    applyCounts(Drift.bucketCounts(batch, text, buckets), batchId)

  // ---- score modality --------------------------------------------

  /** Pin a numeric-score reference: `buckets` equal-width bands over
    * the reference slice's [min, max] (the same binW arithmetic as
    * [[Drift.scoreDrift]]), geometry persisted alongside the counts.
    */
  def setScoreReference(df: DataFrame, score: Column): Unit = {
    val s = df.select(score.cast("long").as("__s"))
      .filter(col("__s").isNotNull)
    val st = s.agg(min("__s"), max("__s")).head()
    require(!st.isNullAt(0),
      "setScoreReference needs at least one scored row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val binw = math.max(1L, Math.floorDiv(hi - lo, buckets.toLong) + 1L)
    writeReference(scoreCounts(df, score, lo, binw), lo, binw)
  }

  /** Score one micro-batch's score distribution against the pinned
    * band geometry. Idempotent per batch id.
    */
  def applyScoreBatch(batch: DataFrame, score: Column,
      batchId: Long): Unit = {
    val (lo, binw) = readGeometry()
    applyCounts(scoreCounts(batch, score, lo, binw), batchId)
  }

  private def scoreCounts(df: DataFrame, score: Column, lo: Long,
      binw: Long): DataFrame =
    df.select(score.cast("long").as("__s"))
      .filter(col("__s").isNotNull)
      // typed-Column integral division (the same IntegralDivide the
      // SQL `div` operator builds — exact, no string interpolation);
      // truncation-vs-floor only differs for __s < lo, where both
      // land in edge band 0 after the clamp
      .select(least(greatest(
        call_function("div", col("__s") - lit(lo), lit(binw)),
        lit(0L)), lit(buckets.toLong - 1L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  // ---- embedding modality ----------------------------------------

  /** Pin an embedding-space reference: counts over 2^planes
    * sign-pattern LSH cells. The hyperplanes are deterministic
    * (seeded by plane index), so no geometry beyond `planes` needs
    * persisting; `buckets` must equal 2^planes.
    */
  def setEmbeddingReference(df: DataFrame, vec: Column, planes: Int,
      dims: Int): Unit = {
    requireCellGeometry(planes)
    writeReference(cellCounts(df, vec, planes, dims), lo = 0L, binw = 1L)
  }

  /** Score one micro-batch's embedding-cell distribution against the
    * pinned reference. Idempotent per batch id.
    */
  def applyEmbeddingBatch(batch: DataFrame, vec: Column, planes: Int,
      dims: Int, batchId: Long): Unit = {
    requireCellGeometry(planes)
    applyCounts(cellCounts(batch, vec, planes, dims), batchId)
  }

  private def requireCellGeometry(planes: Int): Unit =
    require((1 << planes) == buckets,
      s"embedding modality needs buckets == 2^planes " +
        s"(got buckets=$buckets, planes=$planes)")

  private def cellCounts(df: DataFrame, vec: Column, planes: Int,
      dims: Int): DataFrame =
    df.select(Similarity.lshBucket(vec, planes, dims).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  // ---- shared core -----------------------------------------------

  private def writeReference(counts: DataFrame, lo: Long,
      binw: Long): Unit =
    counts.withColumnRenamed("cnt", "c_ref")
      .withColumn("lo", lit(lo))
      .withColumn("binw", lit(binw))
      .repartition(1)
      .write.mode("overwrite").parquet(refDir)

  private def readGeometry(): (Long, Long) = {
    val r = spark.read.parquet(refDir).select("lo", "binw").head()
    (r.getLong(0), r.getLong(1))
  }

  /** Price one batch's sparse bucket counts against the pinned
    * reference and write the verdict row. Idempotent per batch id —
    * gated on the `_SUCCESS` commit marker, not bare directory
    * existence, so a crash mid-write is retried, never skipped.
    */
  private def applyCounts(counts: DataFrame, batchId: Long): Unit = {
    val vDir = s"$verdictsDir/batch=$batchId"
    val (f, p) = fs(vDir)
    if (f.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))) return
    val ref = spark.read.parquet(refDir).select("bucket", "c_ref")
    val totR = ref.agg(sum("c_ref")).head().getLong(0)
    require(totR > 0, "set*Reference must run before apply*Batch")
    val cand = counts.withColumnRenamed("cnt", "c_cand")
    val totCRow = cand.agg(sum("c_cand")).head()
    require(!totCRow.isNullAt(0) && totCRow.getLong(0) > 0,
      s"batch $batchId carries no countable rows")
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
