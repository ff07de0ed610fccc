package graft.ops

import graft.functions.GraftFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-level byte-pair encoding (BPE) — the subword tokenizer every
  * token-budget operator (packing, mixture sampling, token estimates,
  * surprisal) should price in, rather than whitespace words. Public
  * knowledge: Sennrich et al. 2016 / the GPT-2 byte-level variant,
  * over this library's normalized token alphabet ([a-z0-9] single
  * bytes — `GraftFunctions.tokens`).
  *
  * Design for scale:
  *  - TRAINING folds the corpus to a WORD-FREQUENCY table first (one
  *    distributed groupBy — vocabulary-sized, never corpus-sized) and
  *    learns the merge sequence driver-side over that table, the way
  *    production tokenizer trainers do. `maxVocab` bounds the driver
  *    set deterministically (top frequencies, ties by word) for
  *    open-ended vocabularies.
  *  - APPLICATION is a pure projection: a word is exploded into
  *    delimited single-char symbols `(h)(e)(l)(l)(o)` and the learned
  *    merges fold over it as nested `replace` calls — built-in,
  *    codegen'd, scan-parallel, zero shuffle, no UDF. The delimiters
  *    make merge application exact: every symbol is parenthesized on
  *    both sides, so the pattern `(a)(b)` can neither match inside a
  *    symbol nor across shared boundaries, and left-to-right
  *    non-overlapping `replace` IS greedy left-to-right BPE.
  *
  * Determinism contract (shared with the DuckDB oracle twin, which
  * unrolls the same training iterations as CTEs): pair counts weight
  * by word frequency; the winning pair maximizes count with ties
  * broken by the lexicographically SMALLEST `(a, b)`; merges apply
  * left-to-right within each word. The `a)(b` pair-string ordering
  * used by the SQL twin equals `(a, b)` tuple ordering because `)`
  * sorts below every alphabet character.
  */
object Bpe {

  /** One learned merge: adjacent symbols `a`, `b` → symbol `a+b`. */
  final case class Merge(a: String, b: String)

  /** Delimited symbol form of a (normalized) word: every char wrapped
    * as `(c)`.
    */
  def delimit(word: Column): Column =
    regexp_replace(word, "(.)", "($1)")

  /** Above this merge count, [[segment]] routes to the native
    * rank-greedy expression: the replace fold's expression depth is
    * O(nMerges), which blows Janino method limits and analyzer time
    * long before a production 32–50k merge table; the native form's
    * per-word cost is independent of vocabulary size. Below it, the
    * fold stays — it is the SQL-replayable twin the DuckDB oracles
    * unroll, and at fixture vocab sizes the two are byte-equal
    * (property-pinned in BpeSpec).
    */
  val NativeMergeThreshold = 64

  /** The trained-order invariant [[segmentNative]]'s equality
    * argument rests on: every merge's constituents are single
    * characters or the product of an EARLIER merge in the same table
    * (true of any table [[trainFromCorpus]] produces, where a symbol
    * can only exist once built). A hand-assembled table that violates
    * it can make the rank-greedy loop and the replace fold segment
    * differently, so [[segment]] refuses to route such a table to
    * the native form silently.
    */
  def trainedOrder(merges: Seq[Merge]): Boolean = {
    val known = scala.collection.mutable.HashSet.empty[String]
    merges.forall { case Merge(a, b) =>
      val ok = (a.length == 1 || known(a)) && (b.length == 1 || known(b))
      known += (a + b)
      ok
    }
  }

  /** Greedy BPE segmentation of `word` under `merges`. Returns the
    * delimited symbol string. Small merge tables fold as nested
    * replace calls (one codegen'd projection, SQL-replayable);
    * production-sized tables route to [[segmentNative]] — identical
    * output, constant expression depth — after checking the
    * [[trainedOrder]] invariant that equality rests on (a hand-built
    * untrained table must call [[segmentFold]] explicitly).
    */
  def segment(word: Column, merges: Seq[Merge]): Column =
    if (merges.size > NativeMergeThreshold) {
      require(trainedOrder(merges),
        "segment: the merge table violates the trained-order " +
          "invariant (each pair's constituents must be single " +
          "characters or products of EARLIER merges) — the native " +
          "rank-greedy form is only proven equal to the replace fold " +
          "for trained tables; call segmentFold explicitly for " +
          "hand-built tables")
      segmentNative(word, merges)
    } else segmentFold(word, merges)

  /** The replace-fold form of [[segment]]: the trained merge sequence
    * as nested replace calls. O(nMerges) expression depth — fixture
    * vocabularies only.
    */
  def segmentFold(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(delimit(word)) { case (acc, Merge(a, b)) =>
      replace(acc, lit(s"($a)($b)"), lit(s"($a$b)"))
    }

  /** The production form of [[segment]]: one native codegen'd
    * expression walking the word against the merge-rank table
    * (HF-tokenizers greedy-rank loop — see
    * [[graft.functions.NativeImpl.bpeSegment]] for the equality
    * argument). Handles any vocabulary size.
    */
  def segmentNative(word: Column, merges: Seq[Merge]): Column =
    graft.functions.NativeExpressions.bpeSegmentNative(
      word, merges.map(m => (m.a, m.b)))

  /** Symbol count of a segmented form: occurrences of the `)(`
    * separator + 1.
    */
  def nSymbols(seg: Column): Column =
    ((length(seg) - length(replace(seg, lit(")("), lit("")))) / 2 + 1)
      .cast("long")

  /** Subword token count of `word` under `merges`. Prefer binding
    * [[segment]] to a column first when counting in bulk (see
    * [[tokenStats]]) so the fold chain is evaluated once per row.
    */
  def tokenCount(word: Column, merges: Seq[Merge]): Column =
    nSymbols(segment(word, merges))

  /** Train `nMerges` merges over an in-memory word-frequency table.
    * Pure, deterministic; stops early if every word collapses to one
    * symbol.
    */
  def train(wordFreqs: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var words: Seq[(Vector[String], Long)] =
      wordFreqs.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[Merge]
    var done = false
    var t = 0
    while (t < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += Merge(a, b)
        words = words.map { case (syms, c) => (applyMerge(syms, a, b), c) }
        t += 1
      }
    }
    out.result()
  }

  /** Left-to-right non-overlapping merge of adjacent (a, b) — the
    * in-memory twin of the delimited-string replace (spec-pinned
    * equal).
    */
  private[graft] def applyMerge(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train from a corpus: ONE distributed word-frequency aggregation
    * (the only corpus-sized pass), then the driver-side merge loop
    * over at most `maxVocab` words (top counts, ties by word — a
    * deterministic cap for open vocabularies; the fixture corpora fit
    * entirely).
    */
  def trainFromCorpus(df: DataFrame, text: Column, nMerges: Int,
      maxVocab: Int = 100000): Seq[Merge] = {
    val freqs = df.select(explode(tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    train(freqs, nMerges)
  }

  /** Persist a trained merge table as a rank-ordered parquet artifact
    * — the vocab file a production tokenizer ships. One tiny file
    * (O(nMerges) rows), written through the session's filesystem, so
    * the same artifact round-trips on file:/hdfs:/s3a:.
    */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case (m, i) => (i.toLong, m.a, m.b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table saved by [[saveMerges]], rank order restored.
    * The table is vocabulary-sized — collecting it to the driver is
    * exactly how production tokenizers hold their merge ranking.
    */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    spark.read.parquet(path)
      .orderBy("rank")
      .collect()
      .map(r => Merge(r.getAs[String]("a"), r.getAs[String]("b")))
      .toSeq

  /** Per-document subword token counts under `merges`:
    * (id, n_words, n_bpe_tokens) — documents with no tokens report
    * zeros. One scan projection + one aggregation by id.
    * `forceNative` routes segmentation through [[segmentNative]]
    * regardless of merge count (the driver-verified equality probe —
    * see doc_bpe_tokenize_native).
    */
  def tokenStats(df: DataFrame, id: Column, text: Column,
      merges: Seq[Merge], forceNative: Boolean = false): DataFrame = {
    val words = df.select(id.as("id"), explode(tokens(text)).as("w"))
    val counted = words
      .withColumn("seg",
        if (forceNative) segmentNative(col("w"), merges)
        else segment(col("w"), merges))
      .withColumn("n", nSymbols(col("seg")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_bpe_tokens"))
    df.select(id.as("id")).join(counted, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }
}
