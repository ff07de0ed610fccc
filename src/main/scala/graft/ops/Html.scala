package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup text extraction — stage 0 of a crawl-curation
  * pipeline, running BEFORE any of the text operators ([[TextOps]]
  * quality scores, [[Dedup]], language ID) can see the document:
  * comment/script/style removal, block segmentation on the
  * block-level tags, tag stripping, entity decoding, and the
  * link-density boilerplate signal of Kohlschütter et al.'s
  * boilerpipe heuristics (WSDM 2010: anchor-text share is the
  * single strongest shallow feature separating navigation/chrome
  * from body text).
  *
  * Shape at scale: every function here is a per-row scan fold over
  * codegen'd string expressions — zero shuffles, zero UDFs, zero
  * driver work; the block explode in [[blocks]] is a flatMap. The
  * regex/entity constants are interpolated verbatim into the DuckDB
  * oracle twins (anti-drift by construction).
  *
  * Determinism contract: extraction is a pure function of the
  * markup string — one regex pass each for comments, scripts and
  * styles (non-greedy, dotall), a block-tag split, a tag strip, a
  * fixed entity table applied in a fixed order (`&amp;` LAST, so
  * `&amp;lt;` decodes to the literal `&lt;` — double-encoded
  * entities must not double-decode), and a whitespace collapse.
  */
object Html {

  /** HTML comments, dotall non-greedy. */
  val CommentRe = "(?s)<!--.*?-->"

  /** Script/style ELEMENTS — tag pair INCLUDING content (the text
    * inside is code, never prose), case-insensitive dotall. Tag-name
    * boundaries use `(?:[ \t\n/][^>]*)?>` instead of lookahead —
    * RE2 (the oracle twin's engine) has no lookahead, and this form
    * means the same thing in both engines.
    */
  val ScriptRe = "(?is)<script(?:[ \\t\\n\\r\\f/][^>]*)?>.*?</script>"
  val StyleRe = "(?is)<style(?:[ \\t\\n\\r\\f/][^>]*)?>.*?</style>"

  /** Anchor elements; group 1 is the anchor text (the link-density
    * numerator).
    */
  val AnchorRe = "(?is)<a(?:[ \\t\\n\\r\\f/][^>]*)?>(.*?)</a>"

  /** Anchor element WITH an href attribute: group 1 is the href
    * value (double-quoted), group 2 the anchor text — the crawl
    * frontier / link-graph extractor. Non-greedy attribute scan, no
    * lookahead (RE2 twin-compat). The attribute name is anchored at
    * a whitespace boundary (`(?:[^>]*?[ \t\n\r\f])?href=`), so an
    * attribute merely ENDING in "href" (`data-href="/x"`) is not a
    * link (round-15 fix). The boundary classes include `\r`/`\f`
    * (round-16 fix): CRLF-formatted markup separates attributes with
    * `\r\n`, and a class of only ` \t\n` silently dropped any link
    * whose preceding separator char was the `\r` — a miss class the
    * pre-boundary regex did not have. Documented limitation:
    * single-quoted and unquoted href values are skipped — RE2 has no
    * backreferences, and a second quote style would break the
    * 1=href/2=text group contract the index-aligned double extract
    * depends on.
    */
  val AnchorHrefRe = "(?is)<a[ \\t\\n\\r\\f](?:[^>]*?[ \\t\\n\\r\\f])?" +
    "href=\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Block-level boundary tags (open or close): splitting on these
    * yields the visual text blocks of the page. Non-capturing so the
    * split engines treat it as a bare separator; the name list is
    * boundary-safe (`<pre>` must not split as `<p`).
    */
  val BlockTagRe = "(?i)</?(?:p|div|h[1-6]|li|ul|ol|tr|table|td|th|" +
    "section|article|header|footer|blockquote|br)(?:[ \\t\\n/][^>]*)?>"

  /** Any remaining tag (inline markup like <b>, <a href=..>). */
  val TagRe = "<[^>]*>"

  /** Horizontal whitespace runs (collapsed to one space). */
  val WsRe = "[ \\t\\r]+"

  /** Entity table, applied IN ORDER — `&amp;` must be last (see the
    * determinism contract above). `&nbsp;` becomes a plain space: it
    * is layout, not content.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Default boilerplate threshold: a document (or block) whose
    * anchor-text share exceeds 30% is navigation/chrome-dominated
    * (boilerpipe's shallow-text classifier puts the decision
    * boundary for link density in this range).
    */
  val DefaultBoilerplatePpm = 300000L

  private def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (k, v)) =>
      replace(acc, lit(k), lit(v)) }

  /** tags → entities → whitespace, in that fixed order. */
  private def normText(c: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(c, lit(TagRe),
      lit(""))), lit(WsRe), lit(" ")))

  /** Remove comments, then script and style elements wholesale. */
  private def preClean(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      lit(CommentRe), lit("")), lit(ScriptRe), lit("")),
      lit(StyleRe), lit(""))

  private def sumLens(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + length(x).cast("long"))

  /** Document-level extraction: cleaned text (blocks joined by
    * newline), block count, exact character tallies and the
    * link-density boilerplate flag. Returns (id, text_clean,
    * n_blocks, total_chars, link_chars, link_density_ppm,
    * boilerplate) — one scan, no shuffle.
    */
  def extract(df: DataFrame, id: Column, html: Column,
      boilerplatePpm: Long = DefaultBoilerplatePpm): DataFrame = {
    require(boilerplatePpm >= 0,
      s"need boilerplatePpm >= 0, got $boilerplatePpm")
    val c1 = preClean(html)
    val blocks = filter(
      transform(split(c1, BlockTagRe), b => normText(b)),
      b => length(b) > 0)
    val linkChars = sumLens(transform(
      regexp_extract_all(c1, lit(AnchorRe), lit(1)), a => normText(a)))
    df.select(id.as("id"), blocks.as("__b"), linkChars.as("link_chars"))
      .withColumn("text_clean", array_join(col("__b"), "\n"))
      .withColumn("n_blocks", size(col("__b")).cast("long"))
      .withColumn("total_chars", sumLens(col("__b")))
      .drop("__b")
      .withColumn("link_density_ppm",
        call_function("div", col("link_chars") * lit(1000000L),
          greatest(col("total_chars"), lit(1L))))
      .withColumn("boilerplate", col("link_density_ppm") > boilerplatePpm)
      .select("id", "text_clean", "n_blocks", "total_chars",
        "link_chars", "link_density_ppm", "boilerplate")
  }

  /** Link inventory — one row per href-carrying anchor in document
    * order: (id, link_idx, href, anchor_text). The raw href is the
    * caller's to canonicalize ([[UrlOps.canonicalize]]) before edge
    * aggregation; anchor text is normalized like any block text.
    * Both captures come from the SAME regex, so the two
    * `regexp_extract_all` passes stay index-aligned by construction.
    * The explode is a flatMap — zero shuffles.
    */
  def links(df: DataFrame, id: Column, html: Column): DataFrame = {
    val c1 = preClean(html)
    df.select(id.as("id"),
        regexp_extract_all(c1, lit(AnchorHrefRe), lit(1)).as("__h"),
        transform(regexp_extract_all(c1, lit(AnchorHrefRe), lit(2)),
          a => normText(a)).as("__t"))
      .select(col("id"), posexplode(arrays_zip(col("__h"), col("__t")))
        .as(Seq("link_idx", "__z")))
      .select(col("id"), col("link_idx").cast("long").as("link_idx"),
        col("__z.__h").as("href"), col("__z.__t").as("anchor_text"))
  }

  /** Block-level extraction — boilerpipe's actual unit of decision:
    * one row per RAW block-split chunk that still has text after
    * normalization, with the block's own link density (anchors are
    * inline tags, so they stay inside their chunk through the
    * block-tag split). `block_idx` is the chunk's position in the
    * raw split — stable under the filter, so downstream joins can
    * reference blocks across extraction configs. Returns (id,
    * block_idx, block_text, n_chars, link_chars, link_density_ppm,
    * boilerplate); the explode is a flatMap, still zero shuffles.
    */
  def blocks(df: DataFrame, id: Column, html: Column,
      boilerplatePpm: Long = DefaultBoilerplatePpm): DataFrame = {
    require(boilerplatePpm >= 0,
      s"need boilerplatePpm >= 0, got $boilerplatePpm")
    val c1 = preClean(html)
    df.select(id.as("id"), posexplode(split(c1, BlockTagRe))
        .as(Seq("block_idx", "__raw")))
      .withColumn("block_text", normText(col("__raw")))
      .filter(length(col("block_text")) > 0)
      .withColumn("n_chars", length(col("block_text")).cast("long"))
      .withColumn("link_chars", sumLens(transform(
        regexp_extract_all(col("__raw"), lit(AnchorRe), lit(1)),
        a => normText(a))))
      .drop("__raw")
      .withColumn("block_idx", col("block_idx").cast("long"))
      .withColumn("link_density_ppm",
        call_function("div", col("link_chars") * lit(1000000L),
          greatest(col("n_chars"), lit(1L))))
      .withColumn("boilerplate", col("link_density_ppm") > boilerplatePpm)
      .select("id", "block_idx", "block_text", "n_chars", "link_chars",
        "link_density_ppm", "boilerplate")
  }
}
