package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the identity-resolution step a crawl
  * pipeline runs BEFORE any content dedup: the same page is fetched as
  * `HTTP://Example.COM/a//b/?utm_source=x&b=2&a=1#frag` and
  * `http://example.com/a/b?a=1&b=2`, and byte-level URL equality
  * misses the duplicate fetch entirely.
  *
  * Canonical form, applied as pure codegen'd built-ins (no UDF):
  *   - scheme and host lowercased; fragment dropped;
  *   - default ports stripped (`:80` for http, `:443` for https —
  *     only under the matching scheme);
  *   - tracking parameters removed (`utm_*`, `gclid`, `fbclid`,
  *     `ref`), remaining query params SORTED (param order is
  *     transport noise); an emptied query drops its `?`;
  *   - duplicate path slashes collapsed, trailing slash stripped
  *     (non-root), empty path normalized to `/`.
  *
  * Every regex avoids replacement group references ON PURPOSE: Java
  * spells them `$1` where RE2/DuckDB spells `\1`, so any chain using
  * them cannot be replayed verbatim by the oracle engine. Malformed
  * URLs (no `scheme://`) pass through lowercase-trimmed rather than
  * throwing — crawl frontiers contain garbage, and a canonicalizer
  * that dies on it takes the pipeline down (same rule as the media
  * decode fallback).
  */
object UrlFns {

  private val trackingParam = "^(utm_[^=&]*|gclid|fbclid|ref)(=.*)?$"

  def canonicalUrl(url: Column): Column = {
    val raw = trim(url)
    // fragment FIRST: everything after '#' is gone before any other
    // component parses — an unanchored query extract over the raw
    // string would resurrect a '?' hiding inside the fragment
    // ('/p#sec?x=1' must canonicalize to '/p', never '/p?x=1')
    val u = regexp_replace(raw, "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(u, "^[^:/?#]+://([^/?#]*)", 1))
    val host = when(scheme === "http",
        regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(u, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val squashed = regexp_replace(rawPath, "/{2,}", "/")
    val noTrail = when(
      length(squashed) > 1 && endswith(squashed, lit("/")),
      substring(squashed, lit(1), length(squashed) - 1))
      .otherwise(squashed)
    val path = when(noTrail === "", lit("/")).otherwise(noTrail)
    val rawQuery = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_sort(filter(
      // split('') yields [''], not [] — filter empties alongside
      // the tracking params so a bare '?' or '&&' contributes nothing
      split(rawQuery, "&"),
      t => !(t === "" || t.rlike(trackingParam))))
    val query = when(size(kept) > 0,
      concat(lit("?"), concat_ws("&", kept))).otherwise(lit(""))
    when(scheme === "", lower(u))
      .otherwise(concat(scheme, lit("://"), host, path, query))
  }

  /** Full lowercased hostname (port stripped) — the per-site grouping
    * key. Registrable-domain reduction (b.com from a.b.com) needs a
    * public-suffix list, which is a lookup table to broadcast-join at
    * the caller. Empty string when no host parses. */
  def urlHost(url: Column): Column =
    regexp_extract(lower(trim(url)), "^[^:/?#]+://([^/?#:]*)", 1)
}
