package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level filtering — the C4/crawl-
  * curation stage that turns raw crawl URLs into stable dedup/join
  * keys and enforces domain blocklists: lowercase scheme+host, strip
  * the fragment and default ports, drop tracking parameters
  * (`utm_*`, click ids), sort the surviving query parameters, and
  * reduce the host to its registered domain for blocklist joins and
  * per-domain rollups (the q135 domain-cap complement).
  *
  * Everything is a pure column expression over the RE2∩Java-safe
  * regex subset (the q54/q145 discipline) — no UDF, no URI parser
  * dependency, byte-reproducible in a SQL oracle. Malformed URLs
  * (no `scheme://`) canonicalize to NULL rather than a half-parsed
  * guess.
  *
  * Scale shape: canonicalization is MAP-ONLY on the scan; the
  * blocklist joins BROADCAST (blocklists are domain-sized — millions
  * of rows at the top end, never corpus-sized); the per-domain rollup
  * is the one inherent domain-keyed exchange.
  */
object Urls {

  /** Query-parameter keys dropped during canonicalization: the
    * unambiguous analytics/click-id families that vary per impression
    * and never identify content. Deliberately NOT in the default list:
    * generic keys like `ref` — on many sites `?ref=<branch>` or
    * `?ref=<page>` IS content identity, and stripping it would
    * conflate distinct resources into one dedup key (lost documents).
    * A deployment that knows its corpus can pass a wider `dropKeys`
    * to [[canonicalize]].
    */
  val TrackingKeyPattern = "^utm_"
  val TrackingKeys: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "mc_eid")

  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Everything after `scheme://` with the fragment already cut. */
  private def restOf(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)

  /** host[:port] of the authority — userinfo (`user:pass@`) stripped
    * first, or `hostOf` would read everything before the password's
    * colon as the host.
    */
  private def hostPortOf(url: Column): Column =
    regexp_extract(regexp_extract(restOf(url), "^([^/?]*)", 1),
      "([^@]*)$", 1)

  /** Lowercased host without the port. Bracketed IPv6 authorities
    * (`[::1]:8080`) are NOT supported: splitting on the first colon
    * would read `[` as the host and conflate every IPv6 URL into one
    * garbage key, so they return '' here — [[canonicalize]] and
    * [[registeredDomain]] then yield NULL, the documented
    * malformed-goes-NULL behavior (an IPv6 literal has no registered
    * domain to block or roll up on anyway).
    */
  def hostOf(url: Column): Column = {
    val hp = hostPortOf(url)
    when(hp.startsWith("["), lit(""))
      .otherwise(lower(regexp_extract(hp, "^([^:]*)", 1)))
  }

  /** Registered domain: the last two host labels — the blocklist /
    * rollup key. (A production deployment swaps in the public-suffix
    * list for ccSLDs like `co.uk`; the two-label heuristic is the
    * deterministic, dependency-free core.)
    */
  def registeredDomain(url: Column): Column =
    regexp_extract(hostOf(url), "([^.]+\\.[^.]+)$", 1)

  /** Path TEMPLATE of a URL: the path with every digit run masked to
    * `{n}` — `/p/123/rev/4` → `/p/{n}/rev/{n}`. Collapsing the id
    * space turns a million product pages into ONE row, which is what
    * crawl-trap detection needs: a template whose page count keeps
    * growing without bound (calendars, session ids in paths, infinite
    * pagination) is a trap candidate no per-URL analysis can see.
    * NULL for URLs with no parseable authority (the malformed-goes-
    * NULL discipline); an empty path is `/`.
    */
  def pathTemplate(url: Column): Column = {
    val rest = restOf(url)
    val p = regexp_extract(rest, "^[^/?]*(/[^?]*)?", 1)
    val path = when(p === "", "/").otherwise(p)
    when(hostOf(url) === "", lit(null).cast("string"))
      .otherwise(regexp_replace(path, "[0-9]+", "{n}"))
  }

  /** Query parameters exploded: one row per `key=value` pair —
    * (everything the caller selected, param_key, param_value) — the
    * raw material for EMPIRICAL tracking-parameter discovery: a key
    * whose distinct-value count tracks the URL count identifies
    * content (an id); a key with one value per campaign identifies
    * nothing (strip-candidate). Valueless keys (`?flag`) carry ''.
    * Map-side explode; URLs without a query emit nothing. The input
    * must not already carry the output-contract columns (param_key /
    * param_value) — require-guarded like Frontier.schedule, instead of
    * silently overwriting a caller's column.
    */
  def explodeParams(urls: DataFrame, urlCol: String): DataFrame = {
    val clash =
      urls.columns.toSeq.intersect(Seq("param_key", "param_value", "__p"))
    require(clash.isEmpty,
      s"explodeParams: input already has column(s) ${clash.mkString(", ")}" +
        " — rename them before exploding")
    val query = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\\?([^#]*)", 1)
    urls
      .select(urls.columns.toSeq.map(col) :+
        explode(filter(split(query, "&"), q => q =!= "")).as("__p"): _*)
      .select(col("*"),
        regexp_extract(col("__p"), "^([^=]*)", 1).as("param_key"),
        regexp_extract(col("__p"), "^[^=]*=(.*)$", 1).as("param_value"))
      .drop("__p")
  }

  /** Canonical form: `scheme://host[:port]path[?sorted-params]` —
    * scheme/host lowercased, fragment stripped, default ports (http
    * 80, https 443) dropped, tracking parameters removed, surviving
    * parameters byte-order sorted, empty path normalized to `/`.
    * Userinfo (`user:pass@`) is DROPPED — it is never identity for
    * dedup/blocklist purposes and it is a credential (the q54 PII
    * discipline says it must not survive into a stored key).
    * NULL for anything without a `scheme://` and for bracketed-IPv6
    * authorities (unsupported shape, see [[hostOf]]).
    *
    * `dropKeys` is the exact-match query-key drop list (default
    * [[TrackingKeys]]); `utm_*` is always dropped.
    */
  def canonicalize(
      url: Column,
      dropKeys: Seq[String] = TrackingKeys): Column = {
    val scheme = schemeOf(url)
    val rest = restOf(url)
    val host = hostOf(url)
    val port = regexp_extract(hostPortOf(url), ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), "")
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(rest, "^[^/?]*(/[^?]*)?", 1)
    val path = when(path0 === "", "/").otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = filter(split(query, "&"), p => {
      val key = regexp_extract(p, "^([^=]*)", 1)
      p =!= "" && !key.rlike(TrackingKeyPattern) &&
        !key.isin(dropKeys: _*)
    })
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise("")
    when(scheme =!= "" && host =!= "",
      concat(scheme, lit("://"), host, portPart, path, queryPart))
  }

  /** Per-document canonicalization + blocklist verdict + domain
    * rollup: (`idCol`, url_canon, domain, keep, domain_docs).
    * `blocklist` is a one-column (`domain`) frame, broadcast — a doc
    * keeps iff its registered domain is absent. `domain_docs` counts
    * the docs of the row's domain (blocked or not) — the rollup a
    * domain-cap stage reads. Malformed URLs keep (nothing to block
    * on) with NULL url_canon/domain and domain_docs over the NULL
    * group.
    *
    * The rollup is a TWO-PHASE aggregate, never a window: a
    * `count(*) over (partition by domain)` lands every row of a
    * mega-domain (1–10% of a crawl corpus) in ONE task's window
    * buffer — the classic skew OOM. `groupBy(domain).count()`
    * collapses per-task under partial aggregation (a hot domain costs
    * one long per task on the exchange), and the count side is
    * domains-cardinality, so it broadcasts back null-safely (the NULL
    * domain group counts too). At >~100M distinct domains drop the
    * broadcast hint and let AQE pick the join.
    */
  def domainFilterReport(
      docs: DataFrame,
      urlCol: String,
      idCol: String,
      blocklist: DataFrame): DataFrame = {
    require(blocklist.columns.contains("domain"),
      "domainFilterReport: blocklist needs a 'domain' column")
    val canon = docs.select(col(idCol),
      canonicalize(col(urlCol)).as("url_canon"),
      // '' (no scheme://, or a single-label host) normalizes to NULL —
      // "no domain to block on", distinct from a real empty string
      nullif(registeredDomain(col(urlCol)), lit("")).as("domain"))
    val verdict = canon
      .join(broadcast(blocklist.select(col("domain"))
        .withColumn("__blocked", lit(true))), Seq("domain"), "left")
      .select(col(idCol), col("url_canon"), col("domain"),
        col("__blocked").isNull.as("keep"))
    val counts = canon.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"))
      .withColumnRenamed("domain", "__cd")
    verdict
      .join(broadcast(counts), col("domain") <=> col("__cd"), "left")
      .drop("__cd")
  }
}
