package graft

import graft.ops.{TextOps, UrlOps}
import org.apache.spark.sql.functions._

/** Known-answer tests for the quality/crawl ops where the op and its
  * DuckDB twin could share one misunderstanding (the punctDensity
  * class of bug, invisible to the oracle by construction): every
  * expected value below is hand-computed from the PUBLISHED formula
  * or specification — Flesch-Kincaid grade constants, Shannon
  * entropy of a known distribution, the Gopher thresholds at their
  * exact boundaries, URL canonicalization, RFC 9309 / Google-parser
  * robots matching — so both engines agreeing on a wrong formula
  * cannot pass.
  */
class KnownAnswerSpec extends SparkSpec {
  import spark.implicits._

  test("Flesch-Kincaid grade: hand-scored two-sentence fixture " +
      "against the published 0.39/11.8/15.59 constants") {
    // "the cat sat on the mat. the dog ran to the red barn."
    // words = 13, sentences = 2, syllables ([aeiouy]+ runs) = 13
    // FK = 0.39*(13/2) + 11.8*(13/13) - 15.59 = -1.255 → fk_e3 -1255
    val df = Seq((1L, "the cat sat on the mat. the dog ran to the " +
      "red barn.")).toDF("id", "text")
    val r = TextOps.readability(df, col("id"), col("text")).head()
    assert(r.getAs[Long]("n_words") == 13L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 13L)
    assert(r.getAs[Long]("fk_e3") == -1255L,
      s"FK grade must be -1.255 exactly, got ${r.getAs[Long]("fk_e3")}")
  }

  test("char entropy: ln 2 for a 50/50 two-symbol text, ~0 for a " +
      "constant text") {
    val df = Seq((1L, "aabb"), (2L, "aaaa")).toDF("id", "text")
    val out = TextOps.charEntropy(df, col("id"), col("text"))
      .orderBy("id").collect()
    // H({1/2, 1/2}) = ln 2 = 0.693147... → entropy_e6 693147 exactly
    // under the e6 rounding trajectory (hand-replayed)
    assert(math.abs(out(0).getAs[Double]("entropy_e6") - 693147.0) < 0.5,
      s"got ${out(0).getAs[Double]("entropy_e6")}")
    // H of a point mass = 0 (within the e6 rounding of n·ln n)
    assert(math.abs(out(1).getAs[Double]("entropy_e6")) < 1.0,
      s"got ${out(1).getAs[Double]("entropy_e6")}")
  }

  test("gopher punctuation rule: exact 8% boundary, strict; " +
      "mixed-case prose with real punctuation does not trip it") {
    // 25 chars with exactly 2 symbols: 2*100 == 8*25 → NOT flagged
    val atBoundary = "abc def ghi jkl mno pqr" + "!!"
    assert(atBoundary.length == 25 &&
      atBoundary.count(c => !c.isLetterOrDigit && c != ' ') == 2)
    // 25 chars with 3 symbols: 3*100 > 8*25 → flagged
    val over = "abc def ghi jkl mno pq" + "!!!"
    assert(over.length == 25 &&
      over.count(c => !c.isLetterOrDigit && c != ' ') == 3)
    // ordinary mixed-case prose, 5 symbols in 101 chars (<5%): the
    // r14-advice regression — capitals must NOT count as symbols
    val prose = "The Quick Brown Fox, it is said, jumps over the " +
      "Lazy Dog. Mr Smith watched, and The Fox kept duly on."
    assert(prose.length == 101 &&
      prose.count(c => !c.isLetterOrDigit && c != ' ') == 5)
    val df = Seq((1L, atBoundary), (2L, over), (3L, prose))
      .toDF("id", "text")
    val out = TextOps.gopherFlags(df, col("id"), col("text"))
      .orderBy("id").collect()
    assert(!out(0).getAs[Boolean]("f_punct"), "2/25 = 8% must not trip")
    assert(out(1).getAs[Boolean]("f_punct"), "3/25 = 12% must trip")
    assert(!out(2).getAs[Boolean]("f_punct"),
      "mixed-case prose at 4% real punctuation must not trip")
  }

  test("gopher word-count and mean-word-length rules at their " +
      "exact boundaries") {
    val w29 = (1 to 29).map(_ => "word").mkString(" ")
    val w30 = (1 to 30).map(_ => "word").mkString(" ")
    // 10 words, 43 letters → mean 4.3 exactly == the 4300-milli
    // floor → NOT flagged (strict); 42 letters → 4.2 → flagged
    val avgAt = (Seq.fill(7)("abcd") ++ Seq.fill(3)("abcde"))
      .mkString(" ")
    val avgUnder = (Seq.fill(8)("abcd") ++ Seq.fill(2)("abcde"))
      .mkString(" ")
    val df = Seq((1L, w29), (2L, w30), (3L, avgAt), (4L, avgUnder))
      .toDF("id", "text")
    val out = TextOps.gopherFlags(df, col("id"), col("text"))
      .orderBy("id").collect()
    assert(out(0).getAs[Boolean]("f_words"), "29 < 30 must trip")
    assert(!out(1).getAs[Boolean]("f_words"), "30 words must not trip")
    assert(!out(2).getAs[Boolean]("f_avglen"),
      "mean 4.3 at the 4.3 floor must not trip (strict)")
    assert(out(3).getAs[Boolean]("f_avglen"), "mean 4.2 must trip")
  }

  test("URL canonicalization: scheme/host case, www, default port, " +
      "trailing slash, tracking params, param sort, fragment") {
    val df = Seq(
      (1L, "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://example.org"),
      (3L, "not a url")).toDF("id", "u")
    val out = df.select(col("id"),
        UrlOps.canonicalize(col("u")).as("c"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "http://example.com/a/b?a=1&b=2",
      s"got ${out(0).getString(1)}")
    assert(out(1).getString(1) == "https://example.org/",
      s"got ${out(1).getString(1)}")
    assert(out(2).isNullAt(1), "grammar reject must be NULL")
  }

  test("robots.txt: RFC 9309 longest-match and the Google-parser " +
      "wildcard/anchor examples") {
    val txt = Seq("User-agent: *", "Disallow: /foo",
      "Allow: /foo/bar", "Disallow: /*.php$", "Disallow: /fish*")
      .mkString("\n")
    val rules = UrlOps.robotsRules(
      Seq(("example.com", txt)).toDF("host", "txt"),
      col("host"), col("txt"))
    val urls = Seq(
      "/foo/baz", // Disallow /foo wins → blocked
      "/foo/bar/qux", // Allow /foo/bar (8) beats Disallow /foo (4)
      "/filename.php", // /*.php$ → blocked (Google docs example)
      "/filename.phpx", // $ anchor misses → allowed
      "/Filename.PHP", // matching is case-sensitive → allowed
      "/fishheads/yummy", // /fish* → blocked (Google docs example)
      "/bar" // no rule → allowed
    ).map(p => ("example.com", p)).toDF("host", "path")
    val got = UrlOps.robotsVerdict(urls, rules, "testbot")
      .collect().map(r => r.getString(1) -> r.getAs[Boolean]("allowed"))
      .toMap
    assert(!got("/foo/baz"))
    assert(got("/foo/bar/qux"),
      "RFC 9309: the longer Allow must win over the shorter Disallow")
    assert(!got("/filename.php"))
    assert(got("/filename.phpx"), "the $ anchor must not prefix-match")
    assert(got("/Filename.PHP"), "robots matching is case-sensitive")
    assert(!got("/fishheads/yummy"))
    assert(got("/bar"))
  }

  test("robots.txt RFC 9309 group-merge: consecutive User-agent " +
      "lines share one group; a recognized line ends the collection; " +
      "an agent in two groups merges its rules") {
    val txt = Seq(
      "Disallow: /pre-group-drops", // before any UA → no group
      "User-agent: a",
      "User-agent: b", // consecutive: a and b share the group
      "Disallow: /x",
      "Crawl-delay: 5", // recognized non-UA: ends start-collection
      "User-agent: c", // fresh group (must NOT merge with a/b)
      "Disallow: /y",
      "User-agent: a", // a's SECOND group: rules merge across groups
      "Disallow: /z").mkString("\n")
    val rules = UrlOps.robotsRules(
      Seq(("h.com", txt)).toDF("host", "txt"), col("host"), col("txt"))
      .collect()
      .map(r => (r.getString(1), r.getString(3)))
      .toSet
    assert(rules == Set(("a", "/x"), ("b", "/x"), ("c", "/y"),
      ("a", "/z")), s"got $rules")
    // the merged view through the verdict: agent a is bound by BOTH
    // of its groups' rules; agent b only by the first group's
    def allowed(agent: String, path: String): Boolean =
      UrlOps.robotsVerdict(
        Seq(("h.com", path)).toDF("host", "path"),
        UrlOps.robotsRules(Seq(("h.com", txt)).toDF("host", "txt"),
          col("host"), col("txt")), agent)
        .head().getAs[Boolean]("allowed")
    assert(!allowed("a", "/x/1") && !allowed("a", "/z/1"))
    assert(!allowed("b", "/x/1") && allowed("b", "/z/1"))
    assert(!allowed("c", "/y/1") && allowed("c", "/x/1"))
    assert(allowed("a", "/pre-group-drops/1"),
      "a directive before any User-agent line must drop")
  }

  test("token estimate: letter runs and digit runs count separately") {
    val df = Seq((1L, "abc123 def"), (2L, "hello world42"))
      .toDF("id", "text")
    val out = df.select(TextOps.tokenEstimate(col("text")).as("n"))
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(3L, 3L), s"got ${out.toSeq}")
  }
}
