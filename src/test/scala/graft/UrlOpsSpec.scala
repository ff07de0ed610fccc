package graft

import graft.ops.{Html, UrlOps}
import org.apache.spark.sql.functions._

/** URL grammar, canonicalization and registered-domain semantics on
  * hand-built fixtures — every seam the contract names: scheme case,
  * `www.`, default vs real ports, trailing slash, tracking-param
  * removal, parameter ordering, fragments, the public-suffix
  * two-vs-three-label rule, and the NULL branch for grammar
  * rejects.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(Tuple1(url)).toDF("u")
      .select(UrlOps.canonicalize(col("u")).as("c")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  private def reg(host: String): String =
    Seq(Tuple1(host)).toDF("h")
      .select(UrlOps.registeredDomain(col("h")).as("r"))
      .collect().head.getString(0)

  test("canonicalize folds presentation, keeps identity") {
    assert(canon("HTTP://WWW.Ex.COM:80/a/b/?b=2&utm_source=x&a=1#frag")
      == "http://ex.com/a/b?a=1&b=2")
    // https default port strips; a REAL port survives
    assert(canon("https://ex.com:443/x") == "https://ex.com/x")
    assert(canon("http://ex.com:8080/x") == "http://ex.com:8080/x")
    // empty path becomes /; single trailing slash strips on longer
    assert(canon("http://ex.com") == "http://ex.com/")
    assert(canon("http://ex.com/") == "http://ex.com/")
    // all-tracking query vanishes entirely (no dangling '?')
    assert(canon("http://ex.com/p?utm_a=1&fbclid=z&gclid=q")
      == "http://ex.com/p")
    // params sort binary; empty params drop
    assert(canon("http://ex.com/p?z=1&&a=2") == "http://ex.com/p?a=2&z=1")
  }

  test("grammar rejects canonicalize to NULL, never throw") {
    assert(canon("/relative/path") == null)
    assert(canon("not a url at all") == null)
    assert(canon("") == null)
    // scheme-relative (no scheme) is a reject too
    assert(canon("//ex.com/x") == null)
  }

  test("registered domain: two labels vs public-suffix three") {
    assert(reg("a.b.example.com") == "example.com")
    assert(reg("example.com") == "example.com")
    assert(reg("deep.sub.shop.co.uk") == "shop.co.uk")
    assert(reg("user.github.io") == "user.github.io")
    assert(reg("www.blog.blogspot.com") == "blog.blogspot.com")
    // bare single label passes through
    assert(reg("localhost") == "localhost")
  }

  test("parse splits every component with the -1 port sentinel") {
    val r = UrlOps.parse(
      Seq((1L, "https://Sub.Ex.co.uk:8443/p/q?x=1&y=2#top"))
        .toDF("id", "u"), col("id"), col("u")).collect().head
    assert(r.getAs[String]("scheme") == "https")
    assert(r.getAs[String]("host") == "sub.ex.co.uk")
    assert(r.getAs[Long]("port") == 8443L)
    assert(r.getAs[String]("path") == "/p/q")
    assert(r.getAs[String]("query") == "x=1&y=2")
    assert(r.getAs[String]("fragment") == "top")
    assert(r.getAs[String]("reg_domain") == "ex.co.uk")
    val bare = UrlOps.parse(Seq((2L, "http://ex.com")).toDF("id", "u"),
      col("id"), col("u")).collect().head
    assert(bare.getAs[Long]("port") == -1L)
    assert(bare.getAs[String]("path") == "")
    assert(bare.getAs[String]("query") == "")
  }

  test("robots: grouping, empty-value drop, longest-match, agent " +
      "shadowing") {
    val robots = Seq(("h1",
      "Stray: before any group\n" + // no group yet → drops
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n" +
        "Crawl-delay: 5\nDisallow:\n" + // non-directive + empty drop
        "User-agent: graftbot\nDisallow: /articles/\n" +
        "Allow: /articles/ok"),
      ("h2", "User-agent: *\nDisallow: /x")).toDF("host", "txt")
    val rules = UrlOps.robotsRules(robots, col("host"), col("txt"))
    // h1: 2 rules under * + 2 under graftbot; h2: 1 under *
    assert(rules.count() == 5)
    assert(rules.filter(col("prefix") === "").count() == 0)

    def verdict(host: String, path: String, agent: String): Boolean =
      UrlOps.robotsVerdict(
        Seq((host, path)).toDF("host", "path"), rules, agent)
        .collect().head.getAs[Boolean]("allowed")
    // longest match: /private/pub/ Allow beats /private/ Disallow
    assert(!verdict("h1", "/private/x", "otherbot"))
    assert(verdict("h1", "/private/pub/y", "otherbot"))
    // agent shadowing: graftbot sees ONLY its own group on h1 —
    // /private/ is fair game for it, /articles/ is not
    assert(verdict("h1", "/private/x", "graftbot"))
    assert(!verdict("h1", "/articles/7", "graftbot"))
    assert(verdict("h1", "/articles/ok2", "graftbot"))
    // no group for graftbot on h2 → falls back to *
    assert(!verdict("h2", "/x/y", "graftbot"))
    // unknown host / no matching rule → allowed
    assert(verdict("h2", "/other", "graftbot"))
  }

  test("robots crawl-delay: group-scoped, max over merged groups, " +
      "non-integer drops, unset stays null") {
    val robots = Seq(
      ("h1",
        "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n" +
          "User-agent: graftbot\nDisallow: /y"), // named, no delay
      ("h2",
        "User-agent: graftbot\nCrawl-delay: 3\nDisallow: /a\n" +
          "User-agent: graftbot\nCrawl-delay: 7"), // merged → max 7
      ("h3",
        "User-agent: *\nCrawl-delay: fast\nDisallow: /z"), // unparseable
      ("h4", "Crawl-delay: 9\nUser-agent: *\nDisallow: /q") // pre-group
    ).toDF("host", "txt")
    val dl = UrlOps.robotsCrawlDelays(robots, col("host"), col("txt"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(dl(("h1", "*")) == Some(5L))
    assert(dl(("h1", "graftbot")) == None) // named but no delay: NULL
    assert(dl(("h2", "graftbot")) == Some(7L)) // max across groups
    assert(dl(("h3", "*")) == None) // non-integer value drops
    assert(dl(("h4", "*")) == None) // delay before any group drops
  }

  test("Html.links inventories hrefs in document order") {
    val html = "<html><body><a href=\"http://a.com/1\">one</a>" +
      "<a name=\"no-href\">skipped</a>" +
      "<a href=\"/rel\">two <b>bold</b></a>" +
      "<script>var s = '<a href=\"http://fake.com\">x</a>';</script>" +
      "</body></html>"
    val rows = Html.links(Seq((7L, html)).toDF("id", "html"),
      col("id"), col("html")).orderBy("link_idx").collect()
    // the script-embedded anchor is removed by preClean; the
    // href-less anchor never matches
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("href") == "http://a.com/1")
    assert(rows(0).getAs[String]("anchor_text") == "one")
    assert(rows(1).getAs[String]("href") == "/rel")
    assert(rows(1).getAs[String]("anchor_text") == "two bold")
    assert(rows.map(_.getAs[Long]("link_idx")).toSeq == Seq(0L, 1L))
  }
}
