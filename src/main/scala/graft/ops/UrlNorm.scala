package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the FIRST dedup pass of a
  * web-crawl pipeline (CommonCrawl-style corpora dedup by canonical URL
  * before any content hashing: the same article is re-crawled under
  * tracking-param / casing / default-port / fragment variants).
  *
  * No reference counterpart (the reference has no text/web surface);
  * extended LLM-pipeline scope, same family as [[TextExtract]].
  *
  * Rules (the conservative, always-safe subset of RFC 3986 §6 syntax-based
  * normalization plus the universal tracking-param strip):
  *   - scheme and host lowercase (case-insensitive by spec); PATH case is
  *     preserved (paths are case-sensitive);
  *   - leading `www.` dropped from the host;
  *   - default ports stripped (`:80` for http, `:443` for https); any
  *     other explicit port kept;
  *   - fragment dropped (never sent to the server) — and a `?` INSIDE the
  *     fragment is fragment text, not a query (`/p#frag?x=1` has no query);
  *   - userinfo dropped (`user:pass@host` → `host`: credentials are never
  *     part of the resource identity);
  *   - bracketed IPv6 authorities (`[2001:db8::1]:8080`) parse the port
  *     after `]:`, never by splitting the colons inside the literal;
  *   - trailing `/` runs stripped from the path; empty path → `/`;
  *   - query params whose NAME (the part before `=`, or the whole token
  *     when valueless) is a tracking name dropped (`utm_*`, `fbclid`,
  *     `gclid`, `ref` — `?fbclid` and `?fbclid=x` both strip), the rest
  *     SORTED by full `name=value` byte order and re-joined (param order
  *     is almost never semantic; sorting makes equal param SETS compare
  *     equal).
  *
  * Scale design: canonicalization is pure per-row expression work —
  * regexp field extraction plus an array filter/sort over the ≤dozen
  * query params (the HOFs touch a tiny per-row array, not the document
  * body, so interpretation cost is noise — unlike [[TextExtract]] where
  * the per-row payload is the whole document and a native kernel is
  * warranted). The dedup is one hash aggregate on the canonical string:
  * no sort, no window, output bounded by the canonical key space. At
  * 100 TB: scan → map → partial agg → one shuffle on the canonical-url
  * hash — the same shape as exact dedup.
  */
object UrlNorm {

  /** Canonical form of a URL column per the rules above. Absolute
    * `scheme://...` URLs only (the crawl frontier's invariant).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val authority = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo strips through the LAST '@' — RFC 3986 forbids a bare '@'
    // in host or port, so everything before one is credentials
    val hostport = regexp_replace(authority, "^.*@", "")
    // bracketed IPv6 literal: the host is the [...] chunk verbatim (colons
    // inside are address text, not a port separator); the port, if any,
    // follows ']:'. regexp_extract yields '' on no match, so both arms are
    // total.
    val bracketed = hostport.startsWith("[")
    val portArr = split(hostport, ":")
    // CaseWhen evaluates lazily — element_at(…, 2) must not run on a
    // port-less host (ANSI mode turns the out-of-bounds into an error)
    val host = when(bracketed, lower(regexp_extract(hostport, "^(\\[[^\\]]*\\])", 1)))
      .otherwise(regexp_replace(
        lower(element_at(portArr, 1)), "^www\\.", ""))
    val port = when(bracketed, regexp_extract(hostport, "^\\[[^\\]]*\\]:([^:]*)$", 1))
      .when(size(portArr) > 1, element_at(portArr, 2))
      .otherwise(lit(""))
    val keepPort = (port =!= "") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_extract(
      url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathStripped = regexp_replace(path0, "/+$", "")
    val path = when(pathStripped === "", lit("/")).otherwise(pathStripped)
    // anchor to the pre-fragment prefix: a '?' that first appears after
    // '#' is fragment text, not a query delimiter
    val query0 = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    // tracking match is on the param NAME — before '=' if any, the whole
    // token when valueless — so '?fbclid' strips like '?fbclid=x' and a
    // valueless 'utm_x' strips like 'utm_x=1'
    val kept = filter(split(query0, "&"), p => {
      val nm = substring_index(p, "=", 1)
      (p =!= "") && !(nm.startsWith("utm_") ||
        nm === "fbclid" || nm === "gclid" || nm === "ref")
    })
    val canonQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(canonQ =!= "", concat(lit("?"), canonQ)).otherwise(lit("")))
  }

  /** Deterministic messy-crawl URL per doc, derived from (doc_id, source)
    * in pure built-ins so the DuckDB oracle rebuilds the same bytes —
    * the [[TextExtract.syntheticHtml]] pattern. Cycles every rule the
    * canonicalizer owns: scheme/host casing, `www.`, default vs real
    * ports, trailing slash, empty path, shuffled+tracking-polluted query
    * (incl. a per-doc-unique `gclid`/`ref` — one per branch — that MUST
    * be stripped for any two URLs to ever collide), and a fragment.
    */
  def syntheticUrls(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val d = col(idCol)
    def m(k: Int): Column = pmod(d, lit(k.toLong)).cast("string")
    val scheme = when(pmod(d, lit(2L)) === 0, lit("HTTP")).otherwise(lit("https"))
    val www = when(pmod(d, lit(5L)) === 0, lit("WWW.")).otherwise(lit(""))
    val hostSrc = when(pmod(d, lit(3L)) === 0, upper(col(sourceCol)))
      .otherwise(col(sourceCol))
    val port = when(pmod(d, lit(4L)) === 0, lit(":80"))
      .when(pmod(d, lit(4L)) === 1, lit(":443"))
      .when(pmod(d, lit(4L)) === 2, lit(":8080"))
      .otherwise(lit(""))
    val path = when(pmod(d, lit(17L)) === 0, lit(""))
      .otherwise(concat(lit("/Articles/"), m(20),
        when(pmod(d, lit(3L)) === 1, lit("/")).otherwise(lit(""))))
    val query = when(pmod(d, lit(2L)) === 0,
        concat(lit("utm_source=feed&z="), m(3), lit("&page="), m(4),
          lit("&gclid=g"), d.cast("string")))
      .otherwise(
        concat(lit("page="), m(4), lit("&ref=r"), d.cast("string"),
          lit("&z="), m(3)))
    val frag = when(pmod(d, lit(3L)) === 0, concat(lit("#sec-"), m(7)))
      .otherwise(lit(""))
    df.select(col(idCol),
      concat(scheme, lit("://"), www, hostSrc, lit(".Example.COM"), port,
        path, lit("?"), query, frag).as("url"))
  }

  /** URL-level dedup rollup: one row per canonical URL with the crawl
    * count and the kept (minimum) doc id.
    */
  def dedupByCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("kept_doc"))
}
