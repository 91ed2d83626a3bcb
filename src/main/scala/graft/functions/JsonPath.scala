package graft.functions

/** PG SQL/JSON-path filter predicates for `jsonb_path_exists` — the lax-mode
  * `? (...)` shapes of the reference's jsonpath engine
  * (`/root/reference/src/functions.rs:1273-1502`, which delegates to a full
  * PG-dialect jsonpath crate; its documented dominant prod shape is
  * `$[*] ? (@ == x)`).
  *
  * Supported grammar (the shapes PG clients actually send):
  * {{{
  *   path   := base [ '?' '(' pred ')' ]
  *   base   := '$' step*  with at most one '[*]' wildcard
  *   pred   := or ;  or := and ('||' and)* ;  and := atom ('&&' atom)*
  *   atom   := '(' pred ')'
  *           | 'exists' '(' '@' sub ')'
  *           | '@' sub cmpop literal
  *           | '!' atom
  *   literal:= number | "str" | 'str' | true | false | null
  * }}}
  *
  * Compilation targets Spark SQL over Variant: the filtered base resolves to
  * `array<variant>` candidates (lax mode auto-wraps a non-array into a
  * singleton — PG's behavior for both `base[*] ? (p)` and `base ? (p)`), and
  * the predicate becomes an `exists(arr, x -> …)` lambda. Type guards via
  * `schema_of_variant` reproduce PG's no-coercion comparisons (`"5" == 5` is
  * false, not an error), and every data-dependent error collapses to false —
  * lax mode exactly.
  */
object JsonPath {

  private sealed trait Pred
  private case class Cmp(sub: String, op: String, lit: Lit) extends Pred
  private case class Exists(sub: String) extends Pred
  private case class Not(p: Pred) extends Pred
  private case class And(l: Pred, r: Pred) extends Pred
  private case class Or(l: Pred, r: Pred) extends Pred

  private sealed trait Lit
  private case class NumLit(text: String) extends Lit
  private case class StrLit(s: String) extends Lit
  private case class BoolLit(b: Boolean) extends Lit
  private case object NullLit extends Lit

  /** `Some(sql)` when `path` carries a `? (...)` filter; `None` for simple
    * paths (callers keep their fast lane, like the reference's
    * `simple_path_to_variant_path`). `vSql` must be a SQL fragment yielding
    * a Variant. Throws IllegalArgumentException on unsupported syntax —
    * a clear error beats silently-wrong matching. */
  def filterExistsSql(vSql: String, path: String): Option[String] = {
    val qIdx = indexOfFilter(path)
    if (qIdx < 0) return None
    val base = path.take(qIdx).trim
    val rest = path.drop(qIdx + 1).trim
    require(rest.startsWith("(") && rest.endsWith(")"),
      s"jsonb_path_exists: malformed filter in '$path'")
    val pred = new PredParser(rest.substring(1, rest.length - 1)).parse()

    // split the base at its (single) wildcard; a trailing segment after
    // [*] folds into every predicate access (`$.items[*].price ? (@ > 5)`
    // ≡ `$.items[*] ? (@.price > 5)`)
    val star = base.indexOf("[*]")
    require(star < 0 || base.indexOf("[*]", star + 3) < 0,
      s"jsonb_path_exists: at most one [*] level supported in '$path'")
    val (arrPath, post) =
      if (star < 0) (base, "") else (base.take(star), base.drop(star + 3))
    val normalized = {
      val p = arrPath.stripSuffix(".")
      if (p.isEmpty || p == "$") "$" else if (p.startsWith("$")) p else "$." + p
    }
    val esc = normalized.replace("'", "''")
    // lax auto-wrap: array base → its elements; anything else → singleton
    val arr = s"coalesce(try_variant_get($vSql, '$esc', 'array<variant>'), " +
      s"array(try_variant_get($vSql, '$esc', 'variant')))"
    Some(s"coalesce(exists($arr, x -> ${compile("x", post, pred)}), false)")
  }

  /** Position of the filter's `?`, ignoring any inside quoted literals. */
  private def indexOfFilter(path: String): Int = {
    var i = 0; var inS = false; var inD = false
    while (i < path.length) {
      path.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '?' if !inS && !inD => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def compile(x: String, post: String, p: Pred): String = p match {
    case And(l, r) => s"(${compile(x, post, l)} AND ${compile(x, post, r)})"
    case Or(l, r) => s"(${compile(x, post, l)} OR ${compile(x, post, r)})"
    case Not(inner) => s"(NOT coalesce(${compile(x, post, inner)}, false))"
    case Exists(sub) => s"(${access(x, post + sub)} IS NOT NULL)"
    case Cmp(sub, op, lit) =>
      val e = access(x, post + sub)
      lit match {
        case NumLit(n) =>
          // schema guard = PG's no-coercion compare: strings/bools/objects
          // never equal a number (try_variant_get alone would coerce "5")
          s"((CASE WHEN schema_of_variant($e) NOT IN ('STRING','BOOLEAN','OBJECT','ARRAY') " +
            s"THEN try_variant_get($e, '$$', 'double') END) $op $n)"
        case StrLit(s) =>
          val q = s.replace("'", "''")
          s"((CASE WHEN schema_of_variant($e) = 'STRING' " +
            s"THEN variant_get($e, '$$', 'string') END) $op '$q')"
        case BoolLit(b) =>
          s"((CASE WHEN schema_of_variant($e) = 'BOOLEAN' " +
            s"THEN variant_get($e, '$$', 'boolean') END) $op $b)"
        case NullLit => op match {
          case "=" => s"is_variant_null($e)"
          case "!=" => s"(NOT is_variant_null($e))"
          case other => throw new IllegalArgumentException(
            s"jsonb_path_exists: '$other null' is not a valid comparison")
        }
      }
  }

  /** Variant access for a predicate subpath (`""` = the element itself). */
  private def access(x: String, sub: String): String =
    if (sub.isEmpty) x
    else {
      val p = (if (sub.startsWith(".") || sub.startsWith("[")) "$" + sub
        else "$." + sub).replace("'", "''")
      s"try_variant_get($x, '$p', 'variant')"
    }

  /** Recursive-descent parser over the filter body. */
  private final class PredParser(s: String) {
    private var i = 0

    def parse(): Pred = {
      val p = parseOr()
      skipWs()
      require(i >= s.length, s"jsonb_path_exists: trailing input in filter '$s'")
      p
    }

    private def parseOr(): Pred = {
      var l = parseAnd()
      while (eat("||")) l = Or(l, parseAnd())
      l
    }

    private def parseAnd(): Pred = {
      var l = parseAtom()
      while (eat("&&")) l = And(l, parseAtom())
      l
    }

    private def parseAtom(): Pred = {
      skipWs()
      if (eat("!")) return Not(parseAtom())
      if (eat("(")) {
        val p = parseOr()
        require(eat(")"), s"jsonb_path_exists: missing ')' in filter '$s'")
        return p
      }
      if (eat("exists")) {
        require(eat("("), "jsonb_path_exists: exists() needs parentheses")
        require(eat("@"), "jsonb_path_exists: exists() takes an @ path")
        val sub = parseSubPath()
        require(eat(")"), "jsonb_path_exists: exists() missing ')'")
        return Exists(sub)
      }
      require(eat("@"),
        s"jsonb_path_exists: unsupported filter atom at '${s.drop(i)}'")
      val sub = parseSubPath()
      skipWs()
      val op = Seq("==", "!=", "<>", "<=", ">=", "<", ">")
        .find(eat) match {
          case Some("==") => "="
          case Some("<>") => "!="
          case Some(o) => o
          case None => throw new IllegalArgumentException(
            s"jsonb_path_exists: expected comparison at '${s.drop(i)}'")
        }
      Cmp(sub, op, parseLit())
    }

    private def parseSubPath(): String = {
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit ||
        "._[]".contains(s.charAt(i)))) i += 1
      s.substring(start, i)
    }

    private def parseLit(): Lit = {
      skipWs()
      if (i >= s.length) throw new IllegalArgumentException(
        s"jsonb_path_exists: missing literal in filter '$s'")
      s.charAt(i) match {
        case '"' | '\'' =>
          val quote = s.charAt(i); i += 1
          val start = i
          while (i < s.length && s.charAt(i) != quote) i += 1
          require(i < s.length, "jsonb_path_exists: unterminated string literal")
          val str = s.substring(start, i); i += 1
          StrLit(str)
        case c if c.isDigit || c == '-' || c == '+' =>
          val start = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == 'e' || s.charAt(i) == 'E' || s.charAt(i) == '-')) i += 1
          NumLit(s.substring(start, i))
        case _ if eat("true") => BoolLit(true)
        case _ if eat("false") => BoolLit(false)
        case _ if eat("null") => NullLit
        case _ => throw new IllegalArgumentException(
          s"jsonb_path_exists: unsupported literal at '${s.drop(i)}'")
      }
    }

    private def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1

    private def eat(tok: String): Boolean = {
      skipWs()
      if (s.startsWith(tok, i)) { i += tok.length; true } else false
    }
  }
}
