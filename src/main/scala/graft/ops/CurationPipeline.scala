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

  final case class Config(
      minhashK: Int = 16,
      rowsPerBand: Int = 8,
      nearDupJaccard: Double = 0.95,
      minTokens: Int = 20,
      maxStopwordRatio: Double = 0.5,
      minTypeTokenRatio: Double = 0.2,
      keepLang: String = "en")

  /** `docs`: (doc_id long, text string). Returns the kept documents
    * with the per-stage decision columns (for auditability).
    */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("hs", Dedup.shingleHashes(col("toks"), w = 1))

    // stage 1: exact dedup — canonical = min doc_id per content hash
    val exact = Dedup.exact(base, col("text"), col("doc_id"))

    // stage 2: near-dup edges via MinHash LSH + verified Jaccard;
    // the higher id of every verified edge is dropped
    val sigs = Dedup.minhashFromHashes(base, col("hs"), cfg.minhashK)
      .select((col("doc_id") +: (0 until cfg.minhashK).map(j => col(s"sig_$j"))): _*)
    val cand = Dedup.lshCandidates(sigs, "doc_id", cfg.minhashK, cfg.rowsPerBand)
    val t = base.select(col("doc_id"), col("hs"))
    val dropIds = cand
      .join(broadcast(t.select(col("doc_id").as("id_a"), col("hs").as("h_a"))), Seq("id_a"))
      .join(broadcast(t.select(col("doc_id").as("id_b"), col("hs").as("h_b"))), Seq("id_b"))
      .filter(least(size(col("h_a")), size(col("h_b"))).cast("double") >=
        greatest(size(col("h_a")), size(col("h_b"))) * cfg.nearDupJaccard)
      .filter(Dedup.jaccardSorted(col("h_a"), col("h_b")) >= cfg.nearDupJaccard)
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
