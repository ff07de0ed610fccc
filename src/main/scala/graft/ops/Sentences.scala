package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence segmentation and sentence-granular dedup — the CCNet
  * recipe (Wenzek et al., LREC 2020): web-crawl boilerplate repeats
  * at the SENTENCE/PARAGRAPH level (cookie banners, copyright
  * footers, subscribe prompts), so the highest-precision cleanup is
  * to count each sentence's distinct-document frequency across the
  * corpus and strip the ones that repeat — exact-dedup's granularity
  * lowered one level, where near-identical documents that exact and
  * even near-dup passes keep still shed their shared chrome.
  *
  * Segmentation is deliberately rule-based and RE2-safe (the DuckDB
  * twins interpolate the same constants): a boundary is a
  * terminator run followed by whitespace; each sentence is trimmed
  * and stripped of its trailing terminator run, and empties drop.
  * No lookbehind — RE2 has none, and consuming the terminator in
  * the split keeps both engines byte-identical.
  *
  * Shape at scale: [[stats]] is a zero-shuffle scan fold.
  * [[corpusDuplicates]] and [[stripBoilerplate]] shuffle on the
  * sentence key with map-side partial aggregation — the frequency
  * table is sentence-domain-sized, never corpus-sized, and the
  * reconstruction join is a plain equi-join Catalyst plans
  * (broadcast when the boiler table is small, shuffle-hash
  * otherwise). Nothing touches the driver.
  */
object Sentences {

  /** Sentence boundary: terminator run + whitespace run. */
  val BoundaryRe: String = "[.!?]+[ \\t\\n]+"

  /** Trailing terminator run (the final sentence keeps its
    * terminator through the split; strip it for a canonical form).
    */
  val TrailRe: String = "[.!?]+$"

  /** Array of canonical sentences: split on [[BoundaryRe]], strip
    * [[TrailRe]], trim, drop empties. Pure column fold.
    */
  def sentencesOf(text: Column): Column =
    filter(
      transform(split(text, BoundaryRe, -1),
        s => trim(regexp_replace(s, TrailRe, ""))),
      s => length(s) > 0)

  /** Per-document segmentation census: (id, n_sentences, n_distinct,
    * dup_ppm, total_chars) where dup_ppm is the within-document
    * repeated-sentence share — the Gopher-style repetition signal at
    * sentence granularity. One scan, no shuffle.
    */
  def stats(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("id"), sentencesOf(text).as("__s"))
      .select(col("id"),
        size(col("__s")).cast("long").as("n_sentences"),
        size(array_distinct(col("__s"))).cast("long").as("n_distinct"),
        aggregate(col("__s"), lit(0L),
          (a, x) => a + length(x).cast("long")).as("total_chars"))
      .withColumn("dup_ppm",
        call_function("div",
          (col("n_sentences") - col("n_distinct")) * lit(1000000L),
          greatest(col("n_sentences"), lit(1L))))
      .select("id", "n_sentences", "n_distinct", "dup_ppm",
        "total_chars")

  /** Corpus-level repeated sentences — the boilerplate inventory:
    * every sentence of at least `minChars` characters that appears
    * in at least `minDocs` DISTINCT documents, with its document
    * frequency and total occurrence count. Two shuffles, both with
    * map-side combine; output is boiler-domain-sized.
    */
  def corpusDuplicates(df: DataFrame, id: Column, text: Column,
      minChars: Int, minDocs: Long): DataFrame = {
    require(minChars >= 0, s"need minChars >= 0, got $minChars")
    require(minDocs >= 1, s"need minDocs >= 1, got $minDocs")
    df.select(id.as("id"), explode(sentencesOf(text)).as("sentence"))
      .filter(length(col("sentence")) >= minChars)
      .groupBy("id", "sentence").agg(count(lit(1)).as("__occ"))
      .groupBy("sentence")
      .agg(count(lit(1)).as("n_docs"), sum(col("__occ")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** CCNet-style sentence-level dedup: strip every sentence whose
    * distinct-document frequency reaches `maxDocs`, and rebuild each
    * document from its surviving sentences in original order
    * (space-joined). Returns (id, text_kept, n_kept, n_dropped) for
    * EVERY input document — a document stripped to nothing keeps an
    * empty `text_kept`.
    *
    * The frequency table is built once on the sentence key; the
    * strip is a left anti-ish join of the position-exploded
    * sentences against the boiler subset (frequency >= maxDocs),
    * which is boilerplate-domain-sized — small by construction, so
    * Catalyst broadcasts it.
    */
  def stripBoilerplate(df: DataFrame, id: Column, text: Column,
      maxDocs: Long): DataFrame = {
    require(maxDocs >= 2, s"need maxDocs >= 2, got $maxDocs")
    val base = df.select(id.as("id"), sentencesOf(text).as("__s"))
    val ex = base.select(col("id"),
      posexplode(col("__s")).as(Seq("pos", "sentence")))
    val boiler = ex.select(col("id"), col("sentence")).distinct()
      .groupBy("sentence").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= maxDocs)
      .select(col("sentence"), lit(true).as("__boiler"))
    val kept = ex.join(boiler, Seq("sentence"), "left")
      .filter(col("__boiler").isNull)
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"),
            col("sentence")))), x => x.getField("sentence")),
          " ").as("text_kept"))
    base.select(col("id"),
        size(col("__s")).cast("long").as("__n"))
      .join(kept, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("text_kept"), lit("")).as("text_kept"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
