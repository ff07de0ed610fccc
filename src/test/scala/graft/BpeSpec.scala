package graft

import graft.ops.Bpe
import graft.ops.Bpe.Merge
import org.apache.spark.sql.functions._

/** Byte-level BPE: deterministic training on the classic fixture,
  * in-memory merge == delimited-string replace, generalization to
  * unseen words, and the per-document stats operator.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training is deterministic with the pinned tie-break") {
    // the Sennrich fixture: low x5, lower x2, lowest x1
    val freqs = Seq("low" -> 5L, "lower" -> 2L, "lowest" -> 1L)
    val merges = Bpe.train(freqs, 4)
    // pair counts r1: (l,o)=8 (o,w)=8 (w,e)=3 (e,r)=2 (e,s)=1 (s,t)=1
    // — the 8-count tie resolves to the lexicographically smaller pair
    assert(merges == Seq(Merge("l", "o"), Merge("lo", "w"),
      Merge("low", "e"), Merge("lowe", "r")))
  }

  test("training stops early when every word is one symbol") {
    val merges = Bpe.train(Seq("ab" -> 3L, "cd" -> 1L), 10)
    assert(merges == Seq(Merge("a", "b"), Merge("c", "d")))
  }

  test("in-memory merge equals delimited-string replace (randomized)") {
    val rnd = new scala.util.Random(7)
    val alpha = "ab" // tiny alphabet maximizes adjacent collisions
    for (_ <- 1 to 200) {
      val w = Vector.fill(1 + rnd.nextInt(8))(
        alpha(rnd.nextInt(alpha.length)).toString)
      val a = alpha(rnd.nextInt(alpha.length)).toString
      val b = alpha(rnd.nextInt(alpha.length)).toString
      val viaVector = Bpe.applyMerge(w, a, b)
        .map(s => s"($s)").mkString
      val viaReplace = w.map(s => s"($s)").mkString
        .replace(s"($a)($b)", s"($a$b)")
      assert(viaVector == viaReplace, s"w=$w a=$a b=$b")
    }
  }

  test("segment generalizes to UNSEEN words through the merge fold") {
    val merges = Bpe.train(Seq("low" -> 5L, "lower" -> 2L, "lowest" -> 1L), 4)
    val got = Seq("slower", "low", "glow", "xyz").toDF("w")
      .select(col("w"), Bpe.segment(col("w"), merges).as("seg"),
        Bpe.tokenCount(col("w"), merges).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(got("low") == (("(low)", 1L)))
    // never trained on these — the learned merges still apply greedily
    assert(got("slower") == (("(s)(lower)", 2L)))
    assert(got("glow") == (("(g)(low)", 2L)))
    assert(got("xyz") == (("(x)(y)(z)", 3L)))
  }

  test("tokenStats: per-doc word and subword counts; empty docs zero") {
    val merges = Bpe.train(Seq("low" -> 5L, "lower" -> 2L, "lowest" -> 1L), 4)
    val docs = Seq((1L, "low lower lowest"), (2L, "LOW, low!"), (3L, "---"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenStats(docs, col("doc_id"), col("text"), merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // low=(low)=1, lower=(lower)=1 (merge 4 completes it),
    // lowest=(lowe)(s)(t)=3
    assert(got(1L) == ((3L, 5L)))
    assert(got(2L) == ((2L, 2L))) // normalization lowercases + strips
    assert(got(3L) == ((0L, 0L)))
  }
}
