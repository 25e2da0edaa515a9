package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Hand-computed goldens for URL canonicalization — each case isolates
  * one rule (case folding, fragment, tracking-param strip, query
  * re-anchoring, trailing slash) plus the all-at-once mess.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(Tuple1(u)).toDF("url")
      .select(UrlOps.canonicalize($"url").as("c")).head.getString(0)

  test("scheme and host fold to lowercase; path and query stay as-is") {
    assert(canon("HTTPS://WWW.Site.COM/Path/File?Q=Mixed") ===
      "https://www.site.com/Path/File?Q=Mixed")
  }

  test("fragment is dropped") {
    assert(canon("https://h/p#section-2") === "https://h/p")
    assert(canon("https://h/p?id=1#x") === "https://h/p?id=1")
  }

  test("tracking params are stripped wherever they sit") {
    assert(canon("https://h/p?utm_source=a&id=3") === "https://h/p?id=3")
    assert(canon("https://h/p?id=3&utm_campaign=b") === "https://h/p?id=3")
    assert(canon("https://h/p?a=1&ref=tw&b=2") === "https://h/p?a=1&b=2")
    assert(canon("https://h/p?fbclid=XYZ") === "https://h/p")
  }

  test("first surviving & is promoted to ? after the ? was stripped") {
    assert(canon("https://h/p?utm_source=a&id=3&ref=b") === "https://h/p?id=3")
  }

  test("trailing slashes drop, also directly before the query") {
    assert(canon("https://h/p/") === "https://h/p")
    assert(canon("https://h/p//") === "https://h/p")
    assert(canon("https://h/p/?id=1") === "https://h/p?id=1")
    assert(canon("https://h") === "https://h")
  }

  test("the full mess collapses to the canonical key") {
    assert(canon(
      "HTTPS://WWW.Web.Example.COM/sec/5/?utm_source=feed&id=3&ref=en#frag") ===
      "https://www.web.example.com/sec/5?id=3")
  }

  test("a URL with nothing to fix is unchanged") {
    assert(canon("https://h/p?id=3") === "https://h/p?id=3")
  }
}
