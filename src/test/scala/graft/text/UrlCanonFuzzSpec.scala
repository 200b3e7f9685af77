package graft.text

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestHarness

/** Property fuzz over a URL grammar: [[TextFunctions.canonicalizeUrl]]
  * must be a FIXPOINT map (canon ∘ canon == canon) and its outputs must
  * satisfy the rule invariants for every grammar member — the spec that
  * catches rule interactions (userinfo × port, empty query × fragment,
  * root slash × params) no hand-picked example list covers.
  *
  * The batch runs through ONE Spark pass over the generated corpus (a
  * per-case collect would pay a job per sample).
  */
class UrlCanonFuzzSpec extends AnyFunSuite with SparkTestHarness {
  import spark.implicits._

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HtTpS")
    user <- Gen.oneOf("", "u@", "User:Pw@")
    host <- Gen.oneOf("Ex.COM", "a.b.org", "WWW.Site9.net",
      "[::1]", "[2001:DB8::1]")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.choose(0, 3)
    path = (1 to segs).map(i => s"/Seg$i").mkString
    slash <- Gen.oneOf("", "/", "//")
    params <- Gen.someOf(Seq("a=1", "utm_source=x", "B=2", "gclid=g",
      "fbclid=f", "utmx=9"))
    query = if (params.isEmpty) "" else "?" + params.mkString("&")
    frag <- Gen.oneOf("", "#Frag", "#a#b")
  } yield s"$scheme://$user$host$port$path$slash$query$frag"

  test("canonicalizeUrl: fixpoint + invariants over the URL grammar") {
    // Seeded: the corpus (and thus the spec) is rerun-identical.
    val urls = Gen.listOfN(300, genUrl)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
      .distinct
    val out = urls.toDF("u")
      .select($"u", TextFunctions.canonicalizeUrl($"u").as("c"))
      .select($"u", $"c", TextFunctions.canonicalizeUrl($"c").as("cc"))
      .as[(String, String, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (u, c, cc) =>
      assert(c === cc, s"not a fixpoint: $u -> $c -> $cc")
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      assert(!c.contains("@"), s"userinfo survived: $u -> $c")
      // Default ports are scheme-relative: http:443 / https:80 are NOT
      // defaults and must survive.
      if (c.startsWith("http://"))
        assert(!c.contains(":80/") && !c.endsWith(":80") &&
          !c.contains(":80?"), s"http default port survived: $u -> $c")
      if (c.startsWith("https://"))
        assert(!c.contains(":443/") && !c.endsWith(":443") &&
          !c.contains(":443?"), s"https default port survived: $u -> $c")
      assert(!c.contains("utm_") && !c.contains("gclid=") &&
        !c.contains("fbclid="), s"tracking param survived: $u -> $c")
      assert(!c.endsWith("/"), s"trailing slash survived: $u -> $c")
      assert(!c.endsWith("?") && !c.contains("?&"),
        s"degenerate query survived: $u -> $c")
      val scheme = c.takeWhile(_ != ':')
      assert(scheme === scheme.toLowerCase, s"scheme case: $u -> $c")
      // Bracketed IPv6 hosts must survive intact: the host/port split
      // may not fire on the colons INSIDE the brackets (r15 ADVICE).
      if (u.contains("[")) {
        assert(c.contains("[") && c.contains("]"),
          s"IPv6 brackets mangled: $u -> $c")
        val inside = c.substring(c.indexOf('[') + 1, c.indexOf(']'))
        assert(inside === inside.toLowerCase &&
          u.toLowerCase.contains(s"[$inside]"),
          s"IPv6 literal mangled: $u -> $c")
      }
    }
  }

  test("canonicalizeUrl: bracketed IPv6 hosts split host/port correctly") {
    val cases = Seq(
      // non-default port kept, colons inside brackets untouched
      "http://[::1]:8080/p" -> "http://[::1]:8080/p",
      // default port stripped AFTER the bracket group; host lowercased
      "HTTPS://[2001:DB8::1]:443/A/" -> "https://[2001:db8::1]/A",
      "http://[::1]:80/x" -> "http://[::1]/x",
      // no port at all: the ']' tail must not read as a port
      "http://[::1]" -> "http://[::1]")
    val out = cases.map(_._1).toDF("u")
      .select($"u", TextFunctions.canonicalizeUrl($"u").as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(out(u) === want, s"canon($u)")
    }
  }
}
