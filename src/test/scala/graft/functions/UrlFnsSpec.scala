package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Canonical-URL edge cases — the q113 gate covers the bulk variants;
  * this pins the corners a crawl frontier actually contains. */
class UrlFnsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u")
      .select(UrlFns.canonicalUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("case, default port, dup slashes, trailing slash, fragment, " +
      "tracking params and param order all collapse") {
    assert(canon(
      "HTTPS://WWW.Ex.COM:443//a//b/?utm_source=x&b=2&a=1#frag",
      "https://www.ex.com/a/b?a=1&b=2&gclid=zz",
      "https://www.ex.com/a/b?b=2&a=1&fbclid=f&ref=r"
    ).distinct == Seq("https://www.ex.com/a/b?a=1&b=2"))
  }

  test("corners: root path, tracking-only query, bare '?', non-default " +
      "port kept, port under the WRONG scheme kept, path case kept") {
    assert(canon("http://h.com") == Seq("http://h.com/"))
    assert(canon("http://h.com/?utm_source=1") == Seq("http://h.com/"))
    assert(canon("http://h.com/p?") == Seq("http://h.com/p"))
    // '?' INSIDE the fragment must die with the fragment — and must
    // not merge with the genuinely distinct page /p?x=1
    assert(canon("http://h.com/p#sec?x=1") == Seq("http://h.com/p"))
    assert(canon("http://h.com/p?x=1#s?y") == Seq("http://h.com/p?x=1"))
    assert(canon("http://h.com:8080/p") == Seq("http://h.com:8080/p"))
    // :80 is only default for http, :443 only for https
    assert(canon("https://h.com:80/p") == Seq("https://h.com:80/p"))
    assert(canon("http://h.com/CaseKept") == Seq("http://h.com/CaseKept"))
  }

  test("malformed input degrades (lowercase-trim passthrough), " +
      "never throws; urlHost strips port") {
    assert(canon(" No-Scheme/Here ") == Seq("no-scheme/here"))
    import spark.implicits._
    val h = Seq("HTTP://A.B.Com:8080/x?q").toDF("u")
      .select(UrlFns.urlHost(col("u"))).collect()(0).getString(0)
    assert(h == "a.b.com")
  }
}
