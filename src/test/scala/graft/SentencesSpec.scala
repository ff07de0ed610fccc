package graft

import graft.ops.Sentences
import org.apache.spark.sql.functions._

/** Sentence segmentation + CCNet-style sentence dedup semantics:
  * boundary/terminator handling, within-doc repetition stats, the
  * corpus boilerplate inventory, and order-preserving strip.
  */
class SentencesSpec extends SparkSpec {
  import spark.implicits._

  private def sents(text: String): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(Sentences.sentencesOf(col("t")).as("s"))
      .collect().head.getSeq[String](0)

  test("segmentation: boundaries, terminator strip, empties drop") {
    assert(sents("One two. Three four! Five six? Last one.")
      == Seq("One two", "Three four", "Five six", "Last one"))
    // terminator runs collapse; mid-run whitespace variants split
    assert(sents("Wow!!! Really?!\tYes.\nEnd")
      == Seq("Wow", "Really", "Yes", "End"))
    // no terminator at all: one sentence
    assert(sents("no punctuation here") == Seq("no punctuation here"))
    // lone terminators produce no empty sentences
    assert(sents(". . ! ") == Seq())
  }

  test("stats counts within-doc repetition") {
    val df = Seq(
      (1L, "A b. C d. A b. E f."), // 4 sentences, 'A b' twice
      (2L, "X y. Z w.")).toDF("id", "t")
    val rows = Sentences.stats(df, col("id"), col("t"))
      .orderBy("id").collect()
    assert(rows(0).getAs[Long]("n_sentences") == 4L)
    assert(rows(0).getAs[Long]("n_distinct") == 3L)
    assert(rows(0).getAs[Long]("dup_ppm") == 250000L)
    assert(rows(1).getAs[Long]("dup_ppm") == 0L)
  }

  test("corpusDuplicates finds the repeated footer, respects floors") {
    val docs = (1L to 6L).map(i =>
      (i, s"Unique content $i. All rights reserved. Hi."))
      .toDF("id", "t")
    val dups = Sentences.corpusDuplicates(docs, col("id"), col("t"),
      minChars = 4, minDocs = 3L).collect()
    // 'Hi' fails minChars; uniques fail minDocs
    assert(dups.map(_.getAs[String]("sentence")).toSeq ==
      Seq("All rights reserved"))
    assert(dups.head.getAs[Long]("n_docs") == 6L)
    assert(dups.head.getAs[Long]("n_occ") == 6L)
  }

  test("stripBoilerplate preserves order and keeps empty docs") {
    val docs = Seq(
      (1L, "Keep one. Drop me. Keep two."),
      (2L, "Drop me. Keep three."),
      (3L, "Drop me.")).toDF("id", "t")
    val out = Sentences.stripBoilerplate(docs, col("id"), col("t"),
      maxDocs = 3L).orderBy("id").collect()
    assert(out(0).getAs[String]("text_kept") == "Keep one Keep two")
    assert(out(0).getAs[Long]("n_kept") == 2L)
    assert(out(0).getAs[Long]("n_dropped") == 1L)
    assert(out(1).getAs[String]("text_kept") == "Keep three")
    // doc 3 loses everything but still reports
    assert(out(2).getAs[String]("text_kept") == "")
    assert(out(2).getAs[Long]("n_kept") == 0L)
    assert(out(2).getAs[Long]("n_dropped") == 1L)
  }

  test("within-doc repeats do not inflate the distinct-doc count") {
    // 'Echo' twice in ONE doc: nd=1, below maxDocs=2 → kept
    val docs = Seq((1L, "Echo. Echo."), (2L, "Other.")).toDF("id", "t")
    val out = Sentences.stripBoilerplate(docs, col("id"), col("t"),
      maxDocs = 2L).orderBy("id").collect()
    assert(out(0).getAs[String]("text_kept") == "Echo Echo")
  }
}
