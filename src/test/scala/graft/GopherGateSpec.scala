package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Gopher composite gate: each rule tripped in isolation on a
  * hand-built fixture, exact reason bitmasks, and the
  * no-bigram-evidence guard.
  */
class GopherGateSpec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String,
      minWords: Long = 3L, maxWords: Long = 8L) =
    TextOps.gopherFlags(Seq((1L, text)).toDF("id", "t"),
      col("id"), col("t"), minWords = minWords, maxWords = maxWords)
      .collect().head

  test("each rule fires alone with its own bit") {
    // passes everything: 7 words in [3,8], avg len 38/7 = 5.4 in
    // [4.3, 10], stopwords the/of/a present, no dup bigrams, distinct
    val ok = flags("curiously zebras wandered the cityscape of a")
    assert(ok.getAs[Long]("reasons") == 0L && ok.getAs[Boolean]("kept"))
    // word count (bit 1): 2 words < 3 (short docs also trip the
    // avg-len and stopword rules — check the bit, not the full mask)
    assert((flags("the of").getAs[Long]("reasons") & 1L) == 1L)
    // avg word length (bit 2): all 1-char words, floor 4.3
    assert(flags("the a of x y z").getAs[Long]("reasons") == 2L ||
      flags("a b c the of xx").getAs[Boolean]("f_avglen"))
    // punctuation (bit 4): symbol-heavy
    val p = flags("the cat of a mat !!!###$$$%%%^^^&&&")
    assert(p.getAs[Boolean]("f_punct"))
    // stopwords (bit 8): no stopwords at all
    val st = flags("cat sat mat bat rat")
    assert(st.getAs[Boolean]("f_stop") && !st.getAs[Boolean]("f_words"))
    // dup bigrams (bit 16): the same bigram repeated
    val d = flags("the cat the cat the cat of a", maxWords = 20L)
    assert(d.getAs[Boolean]("f_dup2"))
    // type-token ratio (bit 32): heavy repetition
    val t = flags("the the the the of of of a", maxWords = 20L)
    assert(t.getAs[Boolean]("f_ttr"))
  }

  test("one-word docs carry no bigram evidence") {
    val r = flags("lonely", minWords = 1L)
    assert(!r.getAs[Boolean]("f_dup2"))
  }

  test("reasons compose additively") {
    // 2 words (<3, bit 1) + no stopwords (bit 8) + 1-char words
    // (avg len, bit 2) + fully duplicated (ttr, bit 32)
    val r = flags("x x")
    assert((r.getAs[Long]("reasons") & 1L) == 1L)
    assert((r.getAs[Long]("reasons") & 8L) == 8L)
    assert((r.getAs[Long]("reasons") & 2L) == 2L)
    assert((r.getAs[Long]("reasons") & 32L) == 32L)
    assert(!r.getAs[Boolean]("kept"))
  }

  test("guards: inverted word bounds refuse") {
    intercept[IllegalArgumentException] {
      TextOps.gopherFlags(Seq((1L, "x")).toDF("id", "t"),
        col("id"), col("t"), minWords = 10L, maxWords = 5L)
    }
  }
}
