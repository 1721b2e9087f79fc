package graft.core

import org.scalatest.funsuite.AnyFunSuite

class GlobPatternSpec extends AnyFunSuite {
  private def m(glob: String, s: String) = GlobPattern.matches(glob, s)

  test("* and ? wildcards") {
    assert(m("foo.*", "foo.bar.baz"))
    assert(m("foo.bar?", "foo.barz"))
    assert(!m("foo.bar?", "foo.bar"))
  }

  test("dots are literal") {
    assert(!m("foo.bar", "fooxbar"))
    assert(m("foo.bar", "foo.bar"))
  }

  test("brace alternation") {
    assert(m("app.{click,view}.x", "app.click.x"))
    assert(m("app.{click,view}.x", "app.view.x"))
    assert(!m("app.{click,view}.x", "app.error.x"))
  }

  test("character classes with negation") {
    assert(m("host[0-9]", "host7"))
    assert(!m("host[0-9]", "hostx"))
    assert(m("host[!0-9]", "hostx"))
    assert(!m("host[!0-9]", "host3"))
  }

  test("regex metacharacters escaped") {
    assert(m("a+b(c)|d$", "a+b(c)|d$"))
    assert(!m("a+b", "aab"))
  }

  test("braces, classes, and wildcards compose") {
    assert(m("app.{click,view}.user_[0-9]*", "app.click.user_42"))
    assert(m("app.{click,view}.user_[0-9]*", "app.view.user_7x"))
    assert(!m("app.{click,view}.user_[0-9]*", "app.error.user_1"))
    assert(!m("app.{click,view}.user_[0-9]*", "app.click.user_x"))
  }

  test("unclosed class/group rejected") {
    intercept[IllegalArgumentException](GlobPattern.toRegex("a[bc"))
    intercept[IllegalArgumentException](GlobPattern.toRegex("a{b,c"))
  }

  test("escapeLiteral: metachar-bearing names match only themselves") {
    for (name <- Seq("lat,p99", "a*b", "q?x", "m{1,2}", "s[0]", "a!b",
        "c^d", "back\\slash", "app.req.count", "caf\u00e9.\ud83d\ude00")) {
      val esc = GlobPattern.escapeLiteral(name)
      assert(GlobPattern.matches(esc, name), s"$name must match itself")
      assert(!GlobPattern.matches(esc, name + "x"))
    }
    // wildcards stay literal: "a*b" must not match "aXXb"
    assert(!GlobPattern.matches(GlobPattern.escapeLiteral("a*b"), "aXXb"))
    assert(!GlobPattern.matches(GlobPattern.escapeLiteral("q?x"), "qZx"))
    // and inside a brace group built from escaped names
    val g = s"{${GlobPattern.escapeLiteral("lat,p99")},${GlobPattern.escapeLiteral("x")}}"
    assert(GlobPattern.matches(g, "lat,p99"))
    assert(GlobPattern.matches(g, "x"))
    assert(!GlobPattern.matches(g, "lat"))
    assert(!GlobPattern.matches(g, "p99"))
  }
}
