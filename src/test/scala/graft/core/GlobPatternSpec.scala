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
}
