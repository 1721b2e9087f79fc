package graft.core

/** POSIX glob → Java regex translation for metric-name discovery queries.
  *
  * Matches the semantics the reference uses for its glob search surface
  * (reference: blueflood-http/.../utils/GlobPattern.java — itself the
  * classic Hadoop glob translator): `*`/`?` wildcards, `[...]` classes with
  * `[!...]` negation, `{a,b}` alternation, and escaping of regex
  * metacharacters that are not glob metacharacters.
  */
object GlobPattern {

  /** Translate a glob to an anchored-match regex string (no ^$ added — use
    * with full-string matching, e.g. `rlike("^" + re + "$")`). */
  def toRegex(glob: String): String = {
    val regex = new StringBuilder
    var setOpen = 0
    var curlyOpen = 0
    var i = 0
    val len = glob.length
    while (i < len) {
      val c = glob.charAt(i)
      c match {
        case '\\' =>
          i += 1
          require(i < len, s"missing escaped character in glob: $glob")
          regex.append('\\').append(glob.charAt(i))
        case '.' | '$' | '(' | ')' | '|' | '+' =>
          regex.append('\\').append(c)
        case '*' => regex.append(".*")
        case '?' => regex.append('.')
        case '{' => regex.append('('); curlyOpen += 1
        case ',' => regex.append(if (curlyOpen > 0) '|' else ',')
        case '}' =>
          if (curlyOpen > 0) { curlyOpen -= 1; regex.append(')') }
          else regex.append('}')
        case '[' =>
          require(setOpen == 0, s"unclosed character class in glob: $glob")
          setOpen += 1; regex.append('[')
        case '^' =>
          if (setOpen == 0) regex.append('\\')
          regex.append('^')
        case '!' =>
          if (setOpen > 0 && i > 0 && glob.charAt(i - 1) == '[') regex.append('^')
          else regex.append('!')
        case ']' => setOpen = 0; regex.append(']')
        case other => regex.append(other)
      }
      i += 1
    }
    require(setOpen == 0, s"unclosed character class in glob: $glob")
    require(curlyOpen == 0, s"unclosed group in glob: $glob")
    regex.toString
  }

  /** Anchored variant for whole-name matching via `rlike`. */
  def toAnchoredRegex(glob: String): String = "^" + toRegex(glob) + "$"

  /** Escape a literal name so it matches only ITSELF under [[toRegex]] —
    * for building globs from user-supplied exact locators (a metric
    * literally named `lat,p99` must not become the alternation
    * `lat|p99`). Only ASCII punctuation is escaped: every glob
    * metacharacter is ASCII, and chars ≥ 0x80 must pass through UNTOUCHED
    * — escaping them would split surrogate pairs (a `\\` before each half
    * of an astral-plane char builds a regex that can never match the
    * original name). The translator forwards `\\X` verbatim and Java
    * regex treats an escaped punctuation char as that literal. */
  def escapeLiteral(s: String): String =
    s.flatMap(c =>
      if (c.isLetterOrDigit || c == '_' || c >= 0x80) c.toString
      else s"\\$c")

  def matches(glob: String, s: String): Boolean =
    java.util.regex.Pattern.compile(toAnchoredRegex(glob)).matcher(s).matches()
}
