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

  test("canonicalize is idempotent over 300 seeded messy URLs") {
    val rnd = new scala.util.Random(7)
    val schemes = Seq("http", "HTTPS", "Http")
    val hosts = Seq("Example.COM", "www.site.org", "A.B.c.NET")
    val params = Seq("id=3", "utm_source=x", "ref=tw", "q=Mixed+Case",
      "fbclid=ABC", "utm_campaign=y", "page=2")
    val urls = (1 to 300).map { _ =>
      val path = (0 until rnd.nextInt(3)).map(_ => s"p${rnd.nextInt(9)}").mkString("/", "/", "")
      val slash = if (rnd.nextBoolean()) "/" else ""
      val qs = (0 until rnd.nextInt(4)).map(_ => params(rnd.nextInt(params.size)))
      val query = if (qs.isEmpty) "" else qs.mkString("?", "&", "")
      val frag = if (rnd.nextBoolean()) "#Sec-2" else ""
      s"${schemes(rnd.nextInt(3))}://${hosts(rnd.nextInt(3))}$path$slash$query$frag"
    }
    val bad = urls.map(Tuple1(_)).toDF("url")
      .select(UrlOps.canonicalize($"url").as("c1"))
      .select($"c1", UrlOps.canonicalize($"c1").as("c2"))
      .filter($"c1" =!= $"c2")
      .collect()
    assert(bad.isEmpty, s"non-fixpoint: ${bad.take(3).mkString(", ")}")
  }
}
