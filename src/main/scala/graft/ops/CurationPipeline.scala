package graft.ops

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline: exact dedup →
  * near-dup removal (MinHash+LSH, keep the lowest doc id of each
  * near-dup group edge) → quality gates → language filter. Each stage
  * is one of the library's standalone operators; this wires them the
  * way a 100 TB curation job would — no stage materializes a cross
  * product, every filter is a column predicate or an anti-join.
  */
object CurationPipeline {

  /** `bucketCap` defaults FINITE here — the pipeline is the
    * production entry point, and a caller composing it over a real
    * corpus must not silently inherit the quadratic uncapped band
    * join (one boilerplate bucket of 10⁶ docs is 10¹² join rows).
    * The Dedup primitives keep `Int.MaxValue` defaults for exact
    * oracle semantics; opting OUT here is explicit:
    * `Config(bucketCap = Int.MaxValue)`.
    */
  final case class Config(
      minhashK: Int = 16,
      rowsPerBand: Int = 8,
      nearDupJaccard: Double = 0.95,
      minTokens: Int = 20,
      maxStopwordRatio: Double = 0.5,
      minTypeTokenRatio: Double = 0.2,
      keepLang: String = "en",
      bucketCap: Int = 32,
      // optional stage 0: sub-document boilerplate removal
      // (Dedup.dropFrequentChunks) BEFORE the document-level stages,
      // so repeated headers/footers neither link unrelated docs into
      // near-dup groups nor pad quality metrics. Off by default —
      // enabling it changes every downstream text-derived column.
      chunkDedupWindow: Option[Int] = None,
      chunkDedupMaxDf: Long = 2)

  /** `docs`: (doc_id long, text string). Returns the kept documents
    * with the per-stage decision columns (for auditability).
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val cleaned = cfg.chunkDedupWindow match {
      case Some(w) =>
        Dedup.dropFrequentChunks(docs, col("doc_id"), col("text"),
            window = w, maxDocFreq = cfg.chunkDedupMaxDf)
          .select(col("id").as("doc_id"), col("clean_text").as("text"))
      case None => docs
    }
    val base = cleaned
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", Dedup.tokenHashSet(col("text")))

    // stage 1: exact dedup — canonical = min doc_id per content hash
    val exact = Dedup.exact(base, col("text"), col("doc_id"))

    // stage 2: near-dup edges via single-pass MinHash LSH + verified
    // Jaccard (sets ride the band shuffle — no corpus re-join, no
    // broadcast of the doc→set table); the higher id of every
    // verified edge is dropped
    val dropIds = Dedup.minhashNearDupPairs(base, "doc_id", "hs",
        cfg.minhashK, cfg.rowsPerBand, cfg.nearDupJaccard, cfg.bucketCap)
      .select(col("id_b").as("doc_id")).distinct()

    // stages 3+4: quality + language gates (pure column predicates)
    exact
      .join(dropIds.withColumn("__neardup", lit(true)), Seq("doc_id"), "left")
      .withColumn("is_near_dup", coalesce(col("__neardup"), lit(false)))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stopword_ratio", TextOps.stopwordRatio(col("toks")))
      .withColumn("type_token_ratio",
        size(array_distinct(col("toks"))).cast("double") /
          nullif(size(col("toks")).cast("double"), lit(0.0d)))
      .withColumn("predicted_lang", TextOps.langId(col("toks")))
      .withColumn("kept",
        col("is_canonical") && !col("is_near_dup") &&
          col("n_tokens") >= cfg.minTokens &&
          col("stopword_ratio") <= cfg.maxStopwordRatio &&
          col("type_token_ratio") >= cfg.minTypeTokenRatio &&
          col("predicted_lang") === cfg.keepLang)
      .drop("__neardup", "toks", "hs")
  }
}
