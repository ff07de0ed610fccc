package graft.ops

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines. All pure
  * column expressions (codegen'd, no UDFs) — at 100 TB these run
  * embarrassingly parallel over the document scan with no shuffle.
  */
object TextOps {

  /** English stopword sample used by quality scoring and language ID. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  /** Tokenize + basic stats. Adds: toks, n_tokens, n_distinct,
    * avg_token_len (exact int-ratio double).
    */
  def withTokenStats(df: DataFrame, text: Column): DataFrame =
    df.withColumn("toks", tokens(text))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("avg_token_len",
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
          .cast("double") / nullif(col("n_tokens").cast("double"), lit(0.0d)))

  /** Stopword ratio of a token array against a fixed set. */
  def stopwordRatio(toks: Column): Column = {
    val sw = array(EnStopwords.map(lit): _*)
    size(filter(toks, t => array_contains(sw, t))).cast("double") /
      nullif(size(toks).cast("double"), lit(0.0d))
  }

  /** Punctuation density: share of characters that are not
    * alphanumeric or space.
    */
  def punctDensity(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[a-z0-9 ]", "")))
      .cast("double") / nullif(length(text).cast("double"), lit(0.0d))

  /** Heuristic language ID: stopword-ratio thresholding (the n-gram
    * profile degenerates to this on the synthetic corpus; real corpora
    * would extend the marker sets per language).
    */
  def langId(toks: Column, threshold: Double = 0.02): Column =
    when(stopwordRatio(toks) > threshold, "en").otherwise("other")

  /** Whole-document fingerprint: portable polynomial rolling hash. */
  def fingerprint(text: Column): Column = portableHash(text)

  /** Token count with a BPE-ish refinement: maximal letter runs and
    * digit runs count separately (so "abc123" is 2 subword tokens).
    * Extraction-based (no lookarounds), so it is reproducible on
    * RE2-family engines too.
    */
  def tokenEstimate(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0))).cast("long")
}
