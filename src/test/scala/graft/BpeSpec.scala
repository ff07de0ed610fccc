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

  test("native rank-greedy segment is byte-equal to the replace fold") {
    // randomized corpora: train a real merge table (the equality
    // argument only holds for TRAINED tables, where a pair's
    // constituent symbols are created strictly before the pair), then
    // segment both trained AND unseen words through the fold and the
    // native expression — every output byte must agree.
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val alpha = "abcd"
      val corpus = Vector.fill(30)(
        (1 to (1 + rnd.nextInt(7))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString)
      val freqs = corpus.groupBy(identity)
        .map { case (w, g) => w -> (g.size.toLong * (1 + rnd.nextInt(5))) }
        .toSeq
      val merges = Bpe.train(freqs, 1 + rnd.nextInt(12))
      val probe = (corpus ++ Vector.fill(20)(
        (1 to (1 + rnd.nextInt(9))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString)).distinct
      val got = probe.toDF("w")
        .select(col("w"),
          Bpe.segmentFold(col("w"), merges).as("fold"),
          Bpe.segmentNative(col("w"), merges).as("native"))
        .collect()
      got.foreach { r =>
        assert(r.getString(1) == r.getString(2),
          s"trial=$trial w=${r.getString(0)} merges=$merges")
      }
    }
  }

  test("segment refuses to route an untrained merge table to the " +
      "native form") {
    // 65 merges crosses NativeMergeThreshold; the first one's left
    // constituent "xy" was never built by an earlier merge, so the
    // fold/native equality argument does not apply — segment must
    // fail loudly instead of silently switching semantics
    val bad = Bpe.Merge("xy", "z") +:
      (0 until 64).map(i => Bpe.Merge("a", ('b' + i % 20).toChar.toString))
    assert(!Bpe.trainedOrder(bad))
    val e = intercept[IllegalArgumentException] {
      Bpe.segment(col("w"), bad)
    }
    assert(e.getMessage.contains("trained-order"))
    // a genuinely trained table of the same size routes fine
    val words = Vector.tabulate(40)(i => ("ab" * (1 + i % 5)) + "cd" * (i % 3))
    val trained = Bpe.train(words.map(_ -> 1L), 70)
    assert(Bpe.trainedOrder(trained))
    Bpe.segment(col("w"), trained) // no throw
  }

  test("production vocab: >=1000 merges apply under CODEGEN_ONLY") {
    // the r10 scale seam: the replace fold at this vocab size would be
    // a 1000-deep nested expression (Janino method limits, analyzer
    // time); segment() must route to the native expression and the
    // generated code must COMPILE with fallback disabled — a Janino
    // failure is a hard error here, not a silent drop to interpreted.
    val rnd = new scala.util.Random(13)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val freqs = (1 to 4000).map { _ =>
      (1 to (4 + rnd.nextInt(8))).map(_ =>
        alpha(rnd.nextInt(alpha.length))).mkString
    }.distinct.map(w => w -> (1L + rnd.nextInt(100)))
    val merges = Bpe.train(freqs, 1200)
    assert(merges.size >= 1000, s"fixture too small: ${merges.size}")
    val conf = spark.conf
    val prevFactory = conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      // RDD-backed so ConvertToLocalRelation can't constant-fold the
      // projection away (the NativeExprSpec lesson)
      val words = freqs.take(200).map(_._1) :+ "zzzz" :+ "a"
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(words.map(Tuple1(_)), 2))
        .toDF("w")
        .select(col("w"), Bpe.segment(col("w"), merges).as("seg"),
          Bpe.tokenCount(col("w"), merges).as("n"))
      val rows = df.collect()
      assert(rows.length == words.length)
      // spot-check against the in-memory trainer's own apply
      val byWord = rows.map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
      for (w <- words.take(20)) {
        var syms = w.map(_.toString).toVector
        merges.foreach(m => syms = Bpe.applyMerge(syms, m.a, m.b))
        assert(byWord(w) ==
          ((syms.map(s => s"($s)").mkString, syms.size.toLong)), s"w=$w")
      }
    } finally {
      prevFactory.fold(conf.unset("spark.sql.codegen.factoryMode"))(
        conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(conf.unset("spark.sql.codegen.fallback"))(
        conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("merge tables persist and reload in rank order") {
    val merges = Bpe.train(Seq("low" -> 5L, "lower" -> 2L, "lowest" -> 1L), 4)
    val dir = "file:" + java.nio.file.Files
      .createTempDirectory("bpevocab").toString + "/merges"
    Bpe.saveMerges(spark, merges, dir)
    assert(Bpe.loadMerges(spark, dir) == merges)
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
