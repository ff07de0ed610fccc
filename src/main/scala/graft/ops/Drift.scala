package graft.ops

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus slices — the
  * monitoring primitive a continuously-ingesting pipeline runs on
  * every new crawl batch: "does the incoming slice look like the
  * reference corpus, and if not, WHERE does it differ?"
  *
  * Token distributions are compared on a fixed hashed feature space
  * (the same move [[TextOps.dsirWeights]] makes): `buckets` hash
  * buckets replace the raw vocabulary, so the priced comparison table
  * is O(buckets) — fixed, tiny, scale-independent — and a 100 TB
  * slice pair costs one token scan plus one O(buckets) aggregate.
  *
  * Two standard readouts over the same smoothed bucket distributions
  * (reference `r`, candidate `c`, Laplace +1 smoothing so empty
  * buckets stay finite):
  *
  *   PSI_b = (p_c − p_r) · ln(p_c / p_r)     (always ≥ 0 per bucket)
  *   KL_b  =  p_c        · ln(p_c / p_r)
  *
  * with the usual reading: total PSI < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted. Per-bucket contributions are quantized to integer
  * nano-units from exact integer counts through one identical IEEE
  * expression on both engines, so totals are exact integer sums —
  * engine-reproducible however the additions associate.
  */
object Drift {

  /** Per-bucket drift table between the `isRef` and `!isRef` slices
    * of `df`'s token stream. Returns exactly `buckets` rows:
    * (bucket, c_ref, c_cand, psi_e9, kl_e9), ordered by bucket —
    * buckets with no tokens in either slice still appear (smoothing
    * makes their contribution exactly 0).
    *
    * Scale shape: one exploded token scan with a map-side-combined
    * groupBy(bucket) carrying TWO conditional counts (one shuffle of
    * O(buckets) per mapper), one O(buckets) driver total, the priced
    * table built by pure column arithmetic over O(buckets) rows.
    * Nothing corpus-sized ever shuffles.
    */
  def tokenBucketDrift(df: DataFrame, text: Column, isRef: Column,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val toks = df.select(isRef.as("__r"), explode(tokens(text)).as("tok"))
      .withColumn("bucket", pmod(portableHash(col("tok")), lit(buckets.toLong)))
    val cnt = toks.groupBy("bucket").agg(
      sum(when(col("__r"), 1L).otherwise(0L)).as("c_ref"),
      sum(when(!col("__r"), 1L).otherwise(0L)).as("c_cand"))
    val tot = cnt.agg(sum("c_ref"), sum("c_cand")).head()
    require(!tot.isNullAt(0) && tot.getLong(0) > 0,
      "tokenBucketDrift needs a non-empty reference slice")
    require(tot.getLong(1) > 0,
      "tokenBucketDrift needs a non-empty candidate slice")
    priceBuckets(cnt, tot.getLong(0), tot.getLong(1), buckets)
  }

  /** Numeric-score drift: PSI/KL between two slices' distributions of
    * an integral score over `bins` equal-width bands — the monitor a
    * pipeline points at its own quality scores ("did the gate model's
    * score distribution move on the new crawl?"), complementing the
    * token-space [[tokenBucketDrift]]. Same arithmetic binning as the
    * calibration table (membership is a comparison, no ranking), same
    * [[priceBuckets]] pricing, so one scan + one O(bins) aggregate.
    * Returns `bins` rows: (bucket, score_lo, c_ref, c_cand, psi_e9,
    * kl_e9), ordered by bucket.
    */
  def scoreDrift(df: DataFrame, score: Column, isRef: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"need bins >= 2, got $bins")
    val s = df.select(score.cast("long").as("__s"),
      isRef.cast("boolean").as("__r"))
      .filter(col("__s").isNotNull && col("__r").isNotNull)
    val st = s.agg(min("__s"), max("__s"),
      sum(when(col("__r"), 1L).otherwise(0L)),
      sum(when(!col("__r"), 1L).otherwise(0L))).head()
    require(!st.isNullAt(0), "scoreDrift needs at least one scored row")
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    val (totR, totC) = (st.getLong(2), st.getLong(3))
    require(totR > 0, "scoreDrift needs a non-empty reference slice")
    require(totC > 0, "scoreDrift needs a non-empty candidate slice")
    val binW = math.max(1L, Math.floorDiv(hi - lo, bins.toLong) + 1L)
    val cnt = s
      .withColumn("bucket",
        // typed-Column integral division (IntegralDivide, exact);
        // __s >= lo by construction (lo is the global min), so
        // truncation equals floor here
        least(call_function("div", col("__s") - lit(lo), lit(binW)),
          lit(bins.toLong - 1L)).cast("long"))
      .groupBy("bucket").agg(
        sum(when(col("__r"), 1L).otherwise(0L)).as("c_ref"),
        sum(when(!col("__r"), 1L).otherwise(0L)).as("c_cand"))
    priceBuckets(cnt, totR, totC, bins)
      .select(col("bucket"),
        (lit(lo) + col("bucket") * lit(binW)).as("score_lo"),
        col("c_ref"), col("c_cand"), col("psi_e9"), col("kl_e9"))
      .orderBy("bucket")
  }

  /** Embedding-space drift: PSI/KL between two slices' distributions
    * over sign-pattern LSH buckets (2^planes cells from
    * [[Similarity.lshBucket]]'s deterministic hyperplanes) — the
    * monitor a multimodal pipeline points at its embedding columns
    * ("did the new batch land in different regions of embedding
    * space?"), completing the modality triple with
    * [[tokenBucketDrift]] and [[scoreDrift]]. `vec` must be a
    * quantized long-array ([[Similarity.quantize]]). One scan with
    * the codegen'd bucket fold, one O(2^planes) aggregate, the shared
    * [[priceBuckets]] pricing.
    */
  def embeddingDrift(df: DataFrame, vec: Column, isRef: Column,
      planes: Int, dims: Int): DataFrame = {
    require(planes >= 1 && planes <= 20,
      s"need 1 <= planes <= 20 (2^planes buckets), got $planes")
    val buckets = 1 << planes
    val s = df.select(isRef.cast("boolean").as("__r"),
      Similarity.lshBucket(vec, planes, dims).as("bucket"))
    val cnt = s.groupBy("bucket").agg(
      sum(when(col("__r"), 1L).otherwise(0L)).as("c_ref"),
      sum(when(!col("__r"), 1L).otherwise(0L)).as("c_cand"))
    val tot = cnt.agg(sum("c_ref"), sum("c_cand")).head()
    require(!tot.isNullAt(0) && tot.getLong(0) > 0,
      "embeddingDrift needs a non-empty reference slice")
    require(tot.getLong(1) > 0,
      "embeddingDrift needs a non-empty candidate slice")
    priceBuckets(cnt, tot.getLong(0), tot.getLong(1), buckets)
  }

  /** One slice's bucket counts: (bucket, cnt) over the hashed token
    * stream — the monitor's per-batch / reference building block.
    * Sparse (buckets with no tokens are absent).
    */
  def bucketCounts(df: DataFrame, text: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    df.select(explode(tokens(text)).as("tok"))
      .withColumn("bucket",
        pmod(portableHash(col("tok")), lit(buckets.toLong)))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
  }

  /** THE pricing step, shared by the batch operator and the streaming
    * [[graft.streaming.DriftMonitor]] so the two cannot drift: takes
    * sparse per-bucket counts (bucket, c_ref, c_cand), densifies over
    * the full bucket skeleton, and appends the quantized PSI/KL
    * contributions. Identical IEEE sequence on both engines: smoothed
    * p's by one division each, ratio, ln, multiply, round — from
    * exact counts.
    */
  private[graft] def priceBuckets(cnt: DataFrame, totR: Long, totC: Long,
      buckets: Int): DataFrame = {
    val spark = cnt.sparkSession
    import spark.implicits._
    val skeleton = (0 until buckets).map(_.toLong).toDF("bucket")
    val pR = (col("c_ref") + lit(1.0d)) / lit((totR + buckets).toDouble)
    val pC = (col("c_cand") + lit(1.0d)) / lit((totC + buckets).toDouble)
    skeleton.join(cnt, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_ref"), lit(0L)).as("c_ref"),
        coalesce(col("c_cand"), lit(0L)).as("c_cand"))
      .withColumn("psi_e9",
        round((pC - pR) * log(pC / pR) * 1000000000d, 0).cast("long"))
      .withColumn("kl_e9",
        round(pC * log(pC / pR) * 1000000000d, 0).cast("long"))
      .orderBy("bucket")
  }

  /** One-row drift verdict over [[tokenBucketDrift]]'s table: total
    * PSI and KL (exact integer sums of the quantized contributions),
    * slice token totals, and how many buckets individually exceed
    * `hotPsiE9` — the "where did it drift" count that sends an
    * operator to the per-bucket table. O(buckets) work end to end.
    */
  def driftSummary(perBucket: DataFrame, hotPsiE9: Long): DataFrame =
    perBucket.agg(
      sum("c_ref").as("n_ref"), sum("c_cand").as("n_cand"),
      sum("psi_e9").as("psi_e9"), sum("kl_e9").as("kl_e9"),
      sum(when(col("psi_e9") > hotPsiE9, 1L).otherwise(0L))
        .as("n_hot_buckets"))
}
