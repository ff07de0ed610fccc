package graft

import graft.ops.Html
import org.apache.spark.sql.functions._

/** HTML extraction semantics on hand-built fixtures: element removal,
  * entity decoding (incl. the double-encoding trap), block
  * segmentation boundaries, and the link-density boilerplate flag at
  * both document and block level.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String) =
    Html.extract(Seq((1L, html)).toDF("id", "html"),
      col("id"), col("html")).collect().head

  test("script/style/comment content never reaches the text") {
    val r = one("<html><head><style>p{x:1}</style>" +
      "<script type=\"t\">var hidden = 'SECRET';</script></head>" +
      "<body><!-- also hidden --><p>visible words</p></body></html>")
    assert(r.getAs[String]("text_clean") == "visible words")
    assert(r.getAs[Long]("n_blocks") == 1L)
    assert(r.getAs[Long]("total_chars") == 13L)
  }

  test("entities decode once, in the fixed order") {
    // &amp;lt; is a DOUBLE-encoded '<': must decode to the literal
    // string "&lt;", never to '<'
    val r = one("<p>a &lt;tag&gt; &quot;q&quot; it&#39;s A&nbsp;B " +
      "x &amp; y &amp;lt;</p>")
    assert(r.getAs[String]("text_clean") ==
      "a <tag> \"q\" it's A B x & y &lt;")
  }

  test("block segmentation: boundary tags split, inline tags do not") {
    val r = one("<div>one</div><p>two <b>bold</b></p><h2>three</h2>" +
      "four<br>five")
    assert(r.getAs[String]("text_clean") ==
      "one\ntwo bold\nthree\nfour\nfive")
    assert(r.getAs[Long]("n_blocks") == 5L)
  }

  test("<pre> and <header> are not split as <p> and <h1>") {
    // tag-name boundary: 'pre' must not match the 'p' alternative
    val r = one("<pre>code here</pre>")
    assert(r.getAs[Long]("n_blocks") == 1L)
    assert(r.getAs[String]("text_clean") == "code here")
    val r2 = one("<header>site chrome</header><p>body</p>")
    assert(r2.getAs[String]("text_clean") == "site chrome\nbody")
  }

  test("doc-level link density flags a navigation-dominated page") {
    val nav = one("<div><a href=\"/a\">home</a> <a href=\"/b\">about" +
      "</a> <a href=\"/c\">contact</a></div>")
    assert(nav.getAs[Long]("link_chars") == 16L) // home+about+contact
    assert(nav.getAs[Boolean]("boilerplate"))
    val prose = one("<p>a long paragraph of body prose with " +
      "<a href=\"/x\">one link</a> inside it that stays well under " +
      "the threshold</p>")
    assert(!prose.getAs[Boolean]("boilerplate"))
  }

  test("empty and tag-only documents extract to zero, unflagged") {
    val r = one("<div>   </div><p></p>")
    assert(r.getAs[Long]("n_blocks") == 0L)
    assert(r.getAs[Long]("total_chars") == 0L)
    assert(r.getAs[Long]("link_density_ppm") == 0L)
    assert(!r.getAs[Boolean]("boilerplate"))
  }

  test("block-level density: nav block flags, prose block passes") {
    val rows = Html.blocks(
      Seq((7L, "<p>a plain paragraph with plenty of words in it</p>" +
        "<div><a href=\"/a\">home</a> <a href=\"/b\">about</a></div>"))
        .toDF("id", "html"),
      col("id"), col("html")).collect()
      .sortBy(_.getAs[Long]("block_idx"))
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("block_text") ==
      "a plain paragraph with plenty of words in it")
    assert(!rows(0).getAs[Boolean]("boilerplate"))
    assert(rows(1).getAs[Long]("link_chars") == 9L) // home+about
    assert(rows(1).getAs[Boolean]("boilerplate"))
    // block_idx is the RAW split position: first text chunk is after
    // the opening <p> (idx 1), nav text after </p><div> (idx 3)
    assert(rows.map(_.getAs[Long]("block_idx")).toSeq == Seq(1L, 3L))
  }

  test("href extraction: data-href is not a link, the attribute " +
      "needs a whitespace boundary (r14 advice)") {
    val html = "<html><body>" +
      "<a data-href=\"/not-a-link\">spurious</a>" +
      "<a class=\"x\" href=\"/real\">real</a>" +
      "<a href=\"/first\">first</a></body></html>"
    val out = Html.links(Seq((1L, html)).toDF("id", "html"),
        col("id"), col("html"))
      .orderBy("link_idx").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(("/real", "real"), ("/first", "first")),
      s"got ${out.toSeq}")
  }

  test("href extraction survives CRLF-formatted markup (r15 advice)") {
    // attributes separated by \r\n (and the \r alone that a class of
    // only [ \t\n] silently dropped) still yield the link; \f too
    val html = "<html><body>" +
      "<a class=\"x\"\rhref=\"/cr\">cr</a>" +
      "<a\r\nhref=\"/crlf\">crlf</a>" +
      "<a\fhref=\"/ff\">ff</a></body></html>"
    val out = Html.links(Seq((1L, html)).toDF("id", "html"),
        col("id"), col("html"))
      .orderBy("link_idx").collect()
      .map(r => (r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(("/cr", "cr"), ("/crlf", "crlf"),
      ("/ff", "ff")), s"got ${out.toSeq}")
  }

  test("a custom threshold moves the flag") {
    val html = "<p>four words here <a href=\"/x\">linked</a></p>"
    val strict = Html.extract(Seq((1L, html)).toDF("id", "html"),
      col("id"), col("html"), boilerplatePpm = 100000L).collect().head
    assert(strict.getAs[Boolean]("boilerplate"))
    val lax = Html.extract(Seq((1L, html)).toDF("id", "html"),
      col("id"), col("html"), boilerplatePpm = 900000L).collect().head
    assert(!lax.getAs[Boolean]("boilerplate"))
  }
}
