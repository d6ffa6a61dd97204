package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins [[UrlOps]]'s component grammar and canonicalization on the URL
  * shapes crawl corpora actually contain — ports, userinfo, tracking
  * params, fragments, case noise, and plain garbage.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Tuple1(url)).toDF("u").select(c(col("u")).as("r")).head.getString(0)

  test("component extraction: scheme/host/port/path survive userinfo, case, and ports") {
    val u = "HTTPS://user:pw@WWW.Example.ORG:8443/A/b%20c?x=1#frag"
    assert(one(u, UrlOps.scheme) == "https")
    assert(one(u, UrlOps.host) == "www.example.org")
    assert(one(u, UrlOps.siteHost) == "example.org")
    assert(one(u, UrlOps.port) == "8443")
    assert(one(u, UrlOps.path) == "/A/b%20c")
    assert(one(u, UrlOps.queryString) == "x=1")
    // absent components
    assert(one("http://ex.com", UrlOps.port) == "")
    assert(one("http://ex.com", UrlOps.path) == "")
    assert(one("http://ex.com", UrlOps.queryString) == "")
  }

  test("non-URLs yield null from every builder") {
    for (bad <- Seq("not a url", "/relative/path", "www.ex.com/no-scheme", "")) {
      assert(one(bad, UrlOps.scheme) == null, bad)
      assert(one(bad, UrlOps.host) == null, bad)
      assert(one(bad, UrlOps.normalize) == null, bad)
    }
    assert(one(null, UrlOps.normalize) == null)
  }

  test("normalize: default ports, empty path, tracking params, param order, fragment") {
    // default port dropped only when it matches the scheme
    assert(one("HTTP://Ex.COM:80", UrlOps.normalize) == "http://ex.com/")
    assert(one("https://ex.com:443/a", UrlOps.normalize) == "https://ex.com/a")
    assert(one("https://ex.com:80/a", UrlOps.normalize) == "https://ex.com:80/a")
    assert(one("http://ex.com:8080/a", UrlOps.normalize) == "http://ex.com:8080/a")
    // tracking params go, the rest sort; fragment goes; userinfo goes
    assert(one("https://u@ex.com/p?b=2&utm_source=tw&a=1&gclid=XYZ&ref=hn#sec",
      UrlOps.normalize) == "https://ex.com/p?a=1&b=2")
    // all params tracking -> no '?'
    assert(one("https://ex.com/p?utm_campaign=x&fbclid=1", UrlOps.normalize)
      == "https://ex.com/p")
    // empty query / dangling separators
    assert(one("https://ex.com/p?", UrlOps.normalize) == "https://ex.com/p")
    assert(one("https://ex.com/p?&&a=1&", UrlOps.normalize) == "https://ex.com/p?a=1")
    // a param NAMED like a value stays: only the name is matched
    assert(one("https://ex.com/p?x=utm_source", UrlOps.normalize)
      == "https://ex.com/p?x=utm_source")
    // utm prefix matches the name only, not a substring elsewhere
    assert(one("https://ex.com/p?autm_x=1", UrlOps.normalize)
      == "https://ex.com/p?autm_x=1")
  }

  test("normalizeSite folds exactly one leading www off the canonical host") {
    assert(one("https://WWW.Ex.com/p?b=2&a=1", UrlOps.normalizeSite)
      == "https://ex.com/p?a=1&b=2")
    assert(one("https://www.www.ex.com/p", UrlOps.normalizeSite)
      == "https://www.ex.com/p")
    // non-www hosts unchanged, and equal to normalize
    assert(one("https://ex.com/p", UrlOps.normalizeSite) == "https://ex.com/p")
  }

  test("normalization is idempotent on its own output") {
    val urls = Seq(
      "HTTPS://user@WWW.Ex.ORG:443/Path?utm_source=a&z=9&b=2#f",
      "http://ex.com:8080/?gclid=1&a=b",
      "https://a.b.c/x/y/z?p=q")
    for (u <- urls) {
      val n1 = one(u, UrlOps.normalize)
      assert(one(n1, UrlOps.normalize) == n1, u)
    }
  }
}
