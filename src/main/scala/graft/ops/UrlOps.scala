package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL parsing, canonicalization and registered-domain extraction —
  * the crawl-curation companion to [[Html]]: before per-domain
  * quality aggregation, URL-level dedup, or link-graph construction
  * can run, every raw URL must reduce to a canonical form (scheme
  * case, default ports, tracking parameters, parameter order,
  * fragments and `www.` prefixes are all presentation, not identity)
  * and every host to its registered domain (the public-suffix rule:
  * `a.b.co.uk` registers `b.co.uk`, not `co.uk`).
  *
  * Shape at scale: every function is a per-row fold over string
  * expressions — zero shuffles, zero UDFs, zero driver work. The
  * grammar and suffix/tracking tables are interpolated verbatim into
  * the DuckDB oracle twins (anti-drift by construction), so the
  * regexes are RE2-safe: no lookahead, no backreferences.
  *
  * Determinism contract: canonicalization is a pure function of the
  * URL string — one anchored grammar match, lowercase scheme+host,
  * one optional `www.` strip, default-port strip (`:80` for http,
  * `:443` for https), empty path → `/`, ONE trailing-slash strip on
  * multi-char paths, tracking-parameter removal (`utm_*` prefix plus
  * the exact-name table), a BINARY sort of the surviving `k=v`
  * parameter strings, and fragment removal. Unparseable URLs
  * canonicalize to NULL (the caller's DLQ branch), never an
  * exception.
  */
object UrlOps {

  /** Anchored URL grammar. Groups: 1 scheme, 2 host, 3 port digits,
    * 4 path, 5 query (no `?`), 6 fragment (no `#`). Optional groups
    * that do not participate extract as `''` in BOTH engines.
    */
  val UrlRe: String = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#:]*)" +
    "(?::([0-9]+))?([^?#]*)(?:\\?([^#]*))?(?:#(.*))?$"

  /** Tracking parameters stripped by name (plus any `utm_` prefix) —
    * the common click-attribution names that never affect content.
    */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref")

  /** Two-label public suffixes (a deterministic embedded subset of
    * the public-suffix list: ccTLD second-level registries plus the
    * big shared-hosting suffixes). A host ending in one of these
    * registers THREE labels; anything else registers two.
    */
  val TwoLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "com.mx", "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "co.za", "org.za", "com.tr", "com.tw", "co.nz", "net.nz",
    "org.nz", "com.sg", "com.hk", "com.ar", "com.co", "com.my",
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "appspot.com")

  private def grp(url: Column, i: Int): Column =
    regexp_extract(url, UrlRe, i)

  /** Parsed components: (id, url, scheme, host, port, path, query,
    * fragment, reg_domain). `port` is -1 when absent; string
    * components are `''` when absent; a URL the grammar rejects
    * parses to all-absent (scheme `''`) — the caller's filter. One
    * scan, no shuffle.
    */
  def parse(df: DataFrame, id: Column, url: Column): DataFrame = {
    val u = url
    df.select(id.as("id"), u.as("url"),
        lower(grp(u, 1)).as("scheme"), lower(grp(u, 2)).as("host"),
        when(grp(u, 3) === "", lit(-1L))
          .otherwise(grp(u, 3).cast("long")).as("port"),
        grp(u, 4).as("path"), grp(u, 5).as("query"),
        grp(u, 6).as("fragment"))
      .withColumn("reg_domain", registeredDomain(col("host")))
  }

  /** Registered domain of an already-lowercased host: the last two
    * labels, or three when the last two form a [[TwoLabelSuffixes]]
    * entry; hosts with fewer than three labels pass through (there
    * is nothing left to strip). Pure column fold.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.", -1)
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n <= 2, host)
      .otherwise(when(last2.isin(TwoLabelSuffixes: _*), last3)
        .otherwise(last2))
  }

  /** Query-parameter filter + binary sort: drop empty params, any
    * name with the `utm_` prefix, and the [[TrackingParams]] names;
    * sort the survivors as raw `k=v` strings (binary order — both
    * engines' default collation on ASCII).
    */
  private def canonParams(query: Column): Column = {
    val kept = filter(split(query, "&", -1), p => {
      val name = regexp_extract(p, "^([^=]*)", 1)
      p =!= "" && !name.startsWith("utm_") &&
        !name.isin(TrackingParams: _*)
    })
    array_join(array_sort(kept), "&")
  }

  /** Canonical URL under the determinism contract above; NULL when
    * the grammar rejects the URL. `stripWww` folds a single leading
    * `www.` into the apex (the aggressive-dedup default).
    */
  def canonicalize(url: Column, stripWww: Boolean = true): Column = {
    val scheme = lower(grp(url, 1))
    val host0 = lower(grp(url, 2))
    val host =
      if (stripWww) regexp_replace(host0, "^www\\.", "") else host0
    val ps = grp(url, 3)
    val portPart = when(ps === "" ||
        (scheme === "http" && ps === "80") ||
        (scheme === "https" && ps === "443"), lit(""))
      .otherwise(concat(lit(":"), ps))
    val p0 = grp(url, 4)
    val path = when(p0 === "", lit("/"))
      .otherwise(when(length(p0) > 1 && p0.endsWith("/"),
          p0.substr(lit(1), length(p0) - 1))
        .otherwise(p0))
    val q = canonParams(grp(url, 5))
    val qPart = when(q === "", lit("")).otherwise(concat(lit("?"), q))
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        qPart))
  }
}
