package graft

import graft.ops.{Dedup, PipelineOps, TextOps}
import org.apache.spark.sql.functions._

/** Round-10 corpus additions: duplicated-span detection (substring
  * dedup), character entropy, the prefix-blocked edit-distance join,
  * and the leakage-safe split. Fixtures pin the positional/merge
  * arithmetic the sf0.01 oracles exercise at corpus scale.
  */
class DupSpanFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(docs: Seq[(Long, String)], w: Int) =
    Dedup.dupSpans(docs.toDF("doc_id", "text"), col("doc_id"),
        col("text"), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("dupSpans: shared passage yields one maximal span per doc") {
    val docs = Seq(
      1L -> "a b c d e x y z",
      2L -> "q r a b c d e")
    // "a b c","b c d","c d e" each occur twice -> hits merge into one
    // 5-token span: positions 1..3 in doc 1, 3..5 in doc 2
    assert(spansOf(docs, 3) == Set((1L, 1L, 5L), (2L, 3L, 5L)))
  }

  test("dupSpans: within-doc repeat counts; adjacent windows merge") {
    // "a b c" appears at s=1 and s=4; s=4 == running end (1+3) ->
    // adjacency merges them into a single 6-token span
    val docs = Seq(1L -> "a b c a b c", 2L -> "u v w x y z")
    assert(spansOf(docs, 3) == Set((1L, 1L, 6L)))
  }

  test("dupSpans: disjoint duplicated regions stay separate spans") {
    val docs = Seq(
      1L -> "a b c g h i j k d e f",
      2L -> "a b c r s t u v d e f")
    // "a b c" (s=1) and "d e f" (s=9) duplicate; the middles differ.
    // Gap 9 > 1+3 -> two spans per doc.
    assert(spansOf(docs, 3) ==
      Set((1L, 1L, 3L), (1L, 9L, 3L), (2L, 1L, 3L), (2L, 9L, 3L)))
  }

  test("dupSpanStats: zeros for clean docs, exact frac for hit docs") {
    val docs = Seq(
      1L -> "a b c d e x y z",
      2L -> "q r a b c d e",
      3L -> "p p q q r r s s").toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, col("doc_id"), col("text"), 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L) == ((8L, 1L, 5L, 5.0 / 8.0)))
    assert(got(2L) == ((7L, 1L, 5L, 5.0 / 7.0)))
    assert(got(3L) == ((8L, 0L, 0L, 0.0)))
  }

  test("dupSpans: documents shorter than w produce no windows") {
    val docs = Seq(1L -> "a b", 2L -> "a b")
    // both docs identical but too short for a 3-window — no spans
    assert(spansOf(docs, 3).isEmpty)
  }

  test("charEntropy: uniform, constant, non-alphabet, empty") {
    val docs = Seq(
      (1L, "abcd"), // 4 distinct chars once each -> H = ln 4
      (2L, "aaaa"), // constant -> H = 0 (up to e6 quantization)
      (3L, "a!b"), // '!' outside the alphabet -> n_alpha = 2
      (4L, "")).toDF("doc_id", "text")
    val got = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got(1L)._1 == 4L)
    assert(got(1L)._2 == 0L) // all counts are 1 -> n ln n = 0
    assert(math.abs(got(1L)._4 - math.log(4) * 1e6) < 1.0)
    assert(got(2L)._1 == 4L)
    assert(math.abs(got(2L)._4) < 1.0) // 0 up to quantization
    assert(got(3L)._1 == 2L)
    assert(math.abs(got(3L)._4 - math.log(2) * 1e6) < 1.0)
    assert(got(4L) == ((0L, 0L, 0L, 0.0)))
  }

  test("windowHashes: native pass equals the HOF formulation (property)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta9", "x", "count42", "zz", "m3")
    val docs = (1L to 60L).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens, below and above w
      val seps = Vector(" ", ", ", "  ", "! ", " -- ")
      val txt = (0 until n)
        .map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(seps(rnd.nextInt(seps.size)))
      (i, if (rnd.nextInt(10) == 0) txt.toUpperCase else txt)
    }.toDF("doc_id", "text")
    for (w <- Seq(1, 3, 5)) {
      val nat = Dedup.windowHashes(docs, col("doc_id"), col("text"), w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val hof = Dedup.windowHashesHof(docs, col("doc_id"), col("text"), w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(nat == hof, s"w=$w")
    }
  }

  test("charEntropy: zero-shuffle plan (no Exchange anywhere)") {
    val docs = Seq((1L, "some text here"), (2L, "more text"))
      .toDF("doc_id", "text")
    val plan = TextOps.charEntropy(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("stripDupSpans: survivors reassemble in order, clean docs verbatim") {
    val docs = Seq(
      1L -> "a b c d e x y z",
      2L -> "q r a b c d e",
      3L -> "p q r s t u v w").toDF("doc_id", "text")
    val got = Dedup.stripDupSpans(docs, col("doc_id"), col("text"), 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1: span [1,6) -> tokens 6..8 survive
    assert(got(1L) == ((8L, 3L, "x y z")))
    // doc 2: span [3,8) -> tokens 1..2 survive
    assert(got(2L) == ((7L, 2L, "q r")))
    // doc 3: untouched
    assert(got(3L) == ((8L, 8L, "p q r s t u v w")))
  }

  test("stripDupSpans: fully duplicated doc comes back empty") {
    val docs = Seq(
      1L -> "a b c d",
      2L -> "a b c d").toDF("doc_id", "text")
    val got = Dedup.stripDupSpans(docs, col("doc_id"), col("text"), 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((0L, "")) && got(2L) == ((0L, "")))
  }

  test("editDistancePairs: blocked candidates, threshold, ordering") {
    val docs = Seq(
      (1L, "aaaa bbbb x"),
      (2L, "aaaa bbbb y"),
      (3L, "aaaa qqqq zz"),
      (4L, "zzzz different entirely")).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, col("doc_id"), col("text"),
        blockLen = 4, prefixLen = 12, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1-3 share block "aaaa"; only (1,2) is within distance 3,
    // and it surfaces as id_a < id_b
    assert(got.toSeq == Seq((1L, 2L, 1L)))
  }

  test("editDistancePairs: oversize blocks are dropped whole") {
    val docs = Seq(
      (1L, "aaaa bbbb x"),
      (2L, "aaaa bbbb y"),
      (3L, "aaaa bbbb z")).toDF("doc_id", "text")
    val capped = Dedup.editDistancePairs(docs, col("doc_id"), col("text"),
      blockLen = 4, prefixLen = 12, maxDist = 3, blockCap = 2)
    assert(capped.count() == 0L)
    val uncapped = Dedup.editDistancePairs(docs, col("doc_id"), col("text"),
      blockLen = 4, prefixLen = 12, maxDist = 3, blockCap = 3)
    assert(uncapped.count() == 3L)
  }

  test("span ops agree on the real corpus: kept + dup = total, " +
      "stats match strip") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val stats = Dedup.dupSpanStats(docs, col("doc_id"), col("text"), 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3))))
      .toMap
    val strip = Dedup.stripDupSpans(docs, col("doc_id"), col("text"), 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(stats.keySet == strip.keySet && stats.nonEmpty)
    stats.foreach { case (id, (nToks, dupToks)) =>
      val (nToks2, nKept) = strip(id)
      assert(nToks == nToks2 && nKept == nToks - dupToks, s"doc $id")
    }
  }

  test("iqrBounds: exact discrete quartiles and Tukey fences per group") {
    // group a: values 1..8 -> q1 = value at cum*4 >= n (i.e. 2nd),
    // q3 = 6th -> q1=2, q3=6, IQR=4 -> lo=-4, hi=12
    // group b: constant 5 -> q1=q3=5 -> lo=hi=5
    val rows = (1 to 8).map(v => ("a", v.toDouble)) :+ ("b", 5.0) :+ ("b", 5.0)
    val df = rows.toDF("g", "v")
    val got = PipelineOps.iqrBounds(df, col("g"), col("v"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("a") == ((8L, -4.0, 12.0)))
    assert(got("b") == ((2L, 5.0, 5.0)))
  }

  test("bigramSurprisal: chain-rule pricing on a hand fixture") {
    // unigrams: a:3 b:2 c:1 (total 6); bigrams from a: (a,b):2 (a,c):1
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a b"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val uA = math.round(-math.log(3.0 / 6.0) * 1e6)
    val uC = math.round(-math.log(2.0 / 3.0) * 1e6) // b(a,b) = -ln(2/3)
    val bAC = math.round(-math.log(1.0 / 3.0) * 1e6)
    assert(got(1L) == ((2L, uA + uC)))
    assert(got(2L) == ((2L, uA + bAC)))
    assert(got(3L) == got(1L))
    assert(got(4L) == ((0L, 0L)))
  }

  test("containmentPairs: embedded short doc scores 1.0; disjoint absent") {
    // doc 2's 5 tokens sit verbatim inside doc 1 -> its 3 trigrams are
    // a subset (containment 1.0); doc 3 shares nothing rare
    val docs = Seq(
      (1L, "p q r s t u v w x y"),
      (2L, "q r s t u"),
      (3L, "f g h i j k")).toDF("doc_id", "text")
    val sets = docs.select(col("doc_id"),
      graft.ops.Dedup.shingleHashes(
        graft.functions.GraftFunctions.tokens(col("text")), 3).as("hs"))
    val got = graft.ops.Dedup.containmentPairs(sets, "doc_id", "hs",
        dfCap = 40, minShared = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("leakageSafeSplit: components move as one; singletons match splitAssign") {
    val docs = (1L to 40L).map(i => Tuple1(i)).toDF("doc_id")
    // one component {1,2,3} labeled by min id 1, another {10,11}
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val got = PipelineOps.leakageSafeSplit(docs, col("doc_id"), comp,
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L)._2 == got(2L)._2 && got(2L)._2 == got(3L)._2)
    assert(got(10L)._2 == got(11L)._2)
    assert(got(1L)._1 == 1L && got(3L)._1 == 1L && got(11L)._1 == 10L)
    // singletons: rep = own id and split equals plain splitAssign
    val plain = PipelineOps.splitAssign(docs, col("doc_id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 40L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(got(i)._1 == i && got(i)._2 == plain(i))
    }
    // and the linked docs take their REPRESENTATIVE's hash bucket
    assert(got(2L)._2 == plain(1L) && got(11L)._2 == plain(10L))
  }
}
