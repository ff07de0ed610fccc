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

  // -----------------------------------------------------------------
  // robots.txt — crawl politeness
  // -----------------------------------------------------------------

  /** One robots.txt line: group 1 the field (case-folded later),
    * group 2 the value up to a comment hash. RE2-safe.
    */
  val RobotsLineRe: String =
    "^[ \\t]*([A-Za-z-]+)[ \\t]*:[ \\t]*([^#]*)"

  /** Parse robots.txt bodies into a rules table: one row per
    * (agent, Allow/Disallow directive) pair. RFC 9309 §2.2.1
    * group-merge: CONSECUTIVE `User-agent` lines (among recognized
    * lines) open ONE group, and every directive of that group emits
    * a row for EACH of its agents; any recognized non-UA line ends
    * the start-group collection, so a later `User-agent` starts a
    * fresh group. An agent named in several groups is merged
    * downstream for free — [[robotsVerdict]] evaluates ALL rule rows
    * of the chosen agent, which is exactly the RFC's
    * merge-groups-per-product-token. Directives before any
    * User-agent line attach to no group and drop; an EMPTY-value
    * directive drops (RFC 9309: a bare `Disallow:` disallows
    * NOTHING — it is not a zero-length match). Returns
    * (host, agent, allow: Boolean, prefix).
    *
    * Two windows per host over that host's robots lines (partitioned
    * by host — parallel across hosts, a robots file is KB-sized);
    * everything else is a scan fold plus one block-id equi-join.
    */
  /** The shared robots.txt group parse: (blocks, agents) — blocks
    * carries every recognized line with its UA-block id `__blk`,
    * agents one row per (host, __blk, agent) named in the block.
    */
  private def robotsBlocks(df: DataFrame, host: Column,
      txt: Column): (DataFrame, DataFrame) = {
    val lines = df.select(host.as("host"),
      posexplode(split(txt, "\n", -1)).as(Seq("line_idx", "__l")))
    val parsed = lines.select(col("host"), col("line_idx"),
      lower(regexp_extract(col("__l"), RobotsLineRe, 1)).as("field"),
      trim(regexp_extract(col("__l"), RobotsLineRe, 2)).as("value"))
      .filter(col("field") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy("line_idx")
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, org.apache.spark.sql.expressions.Window
      .currentRow)
    // block id: a User-agent line STARTS a block iff the previous
    // recognized line is not a User-agent line; every line carries
    // the running count of started blocks — directives thereby point
    // at the nearest preceding UA block
    val blocks = parsed
      .withColumn("__start",
        col("field") === "user-agent" &&
          coalesce(lag(col("field"), 1).over(w), lit("")) =!=
            "user-agent")
      .withColumn("__blk",
        sum(when(col("__start"), 1L).otherwise(0L)).over(run))
    val agents = blocks.filter(col("field") === "user-agent")
      .select(col("host"), col("__blk"),
        lower(col("value")).as("agent"))
    (blocks, agents)
  }

  def robotsRules(df: DataFrame, host: Column, txt: Column): DataFrame =
    robotsRulesAndDelays(df, host, txt)._1

  /** Both robots products off ONE block parse — callers needing
    * rules AND crawl-delays (the paced frontier) build both frames
    * from a single [[robotsBlocks]] lineage instead of re-running
    * the posexplode + window parse per product.
    */
  def robotsRulesAndDelays(df: DataFrame, host: Column,
      txt: Column): (DataFrame, DataFrame) = {
    val (blocks, agents) = robotsBlocks(df, host, txt)
    val rules = blocks
      .filter(col("field").isin("allow", "disallow") &&
        col("value") =!= "" && col("__blk") > 0L)
      .select(col("host"), col("__blk"),
        (col("field") === "allow").as("allow"),
        col("value").as("prefix"))
      .join(agents, Seq("host", "__blk"))
      .select(col("host"), col("agent"), col("allow"), col("prefix"))
    val delays = agents.join(blocks
        .filter(col("field") === "crawl-delay" &&
          col("value").rlike("^[0-9]+$") && col("__blk") > 0L)
        .select(col("host"), col("__blk"),
          col("value").cast("long").as("__d")),
      Seq("host", "__blk"), "left")
      .groupBy("host", "agent")
      .agg(max(col("__d")).as("delay_s"))
    (rules, delays)
  }

  /** Per-(host, agent) `Crawl-delay` — the de-facto politeness
    * extension (not in RFC 9309; Bing/Yandex semantics: seconds
    * between fetches), group-scoped exactly like Allow/Disallow via
    * the same block parse. Returns one row per (host, agent) named
    * anywhere on the host with a NULLABLE `delay_s`: null when the
    * agent's groups never set a delay (callers supply the default —
    * an agent with its own group does NOT inherit the `*` group's
    * delay, mirroring [[robotsVerdict]]'s one-applicable-group
    * rule). Non-integer values drop as unparseable; if an agent's
    * merged groups disagree the MAX wins (the conservative read).
    */
  def robotsCrawlDelays(df: DataFrame, host: Column,
      txt: Column): DataFrame =
    robotsRulesAndDelays(df, host, txt)._2

  /** Evaluate crawlability of (host, path) pairs against a
    * [[robotsRules]] table for `agent`: the RFC 9309 longest-match
    * rule — the applicable group is the agent's own if the host has
    * one, else `*`; among that group's rules matching the path, the
    * most specific (longest rule value, RFC 9309 §2.2.2 "most
    * octets") wins, Allow winning ties; no matching rule (or no
    * rules at all for the host) means allowed.
    *
    * Rule values support the two RFC 9309 §2.2.3 metacharacters:
    * `*` matches any character sequence and a TRAILING `$` anchors
    * the match at the end of the path (a `$` anywhere else is a
    * literal, matching the Google parser's behavior). Plain values
    * keep the codegen'd `startsWith` fast path; only rules that
    * actually carry a metacharacter pay the per-row regex (built
    * RE2-safe so the DuckDB twin evaluates the identical pattern).
    * Specificity counts the rule value as written, wildcards
    * included, on both engines.
    *
    * Input `urls` must carry columns `host` and `path`; all its
    * columns pass through plus a boolean `allowed`. Shape: two
    * equi-joins on host (the rules side is robots-domain-sized —
    * small; Catalyst broadcasts it) and one map-side-combined
    * aggregation back to the input grain. The longest-match argmax
    * rides a single packed long (prefix length doubled plus the
    * allow bit) — no window, no struct ordering.
    */
  def robotsVerdict(urls: DataFrame, rules: DataFrame,
      agent: String): DataFrame = {
    require(agent.nonEmpty, "need a non-empty agent")
    val a = lit(agent.toLowerCase(java.util.Locale.ROOT))
    // hosts where the agent has its own group
    val exact = rules.filter(col("agent") === a)
      .select(col("host")).distinct()
      .withColumn("__has_exact", lit(true))
    val applicable = rules.filter(col("agent") === a ||
        col("agent") === "*")
      .join(exact, Seq("host"), "left")
      .filter(when(coalesce(col("__has_exact"), lit(false)),
        col("agent") === a).otherwise(col("agent") === "*"))
      .select(col("host"), col("allow"), col("prefix"))
    val key = urls.columns.map(col)
    // RFC 9309 §2.2.3 metacharacters: a trailing `$` anchors at
    // path end, `*` matches any run. The rule value is translated
    // to an anchored RE2-safe regex (escape everything except `*`,
    // then `*` → `.*`); values without metacharacters stay on the
    // codegen'd startsWith path and never touch the regex branch.
    val anchored = col("prefix").endsWith("$")
    val body = when(anchored,
      expr("substring(prefix, 1, length(prefix) - 1)"))
      .otherwise(col("prefix"))
    val escaped = regexp_replace(body,
      "([\\\\^$.|?+()\\[\\]{}])", "\\\\$1")
    val rx = concat(lit("^"), regexp_replace(escaped, "\\*", ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
    val matched = urls.join(applicable, Seq("host"), "left")
      .withColumn("__hit", col("prefix").isNotNull &&
        when(col("prefix").contains("*") || anchored,
            regexp_like(col("path"), rx))
          .otherwise(col("path").startsWith(col("prefix"))))
      // packed verdict rank: longer prefix beats shorter, allow
      // beats disallow at equal length; NULL when the rule misses
      .withColumn("__rank", when(col("__hit"),
        length(col("prefix")).cast("long") * 2L +
          when(col("allow"), 1L).otherwise(0L)))
    matched.groupBy(key: _*)
      .agg(max(col("__rank")).as("__best"))
      .withColumn("allowed",
        col("__best").isNull || col("__best") % 2L === 1L)
      .drop("__best")
  }
}
