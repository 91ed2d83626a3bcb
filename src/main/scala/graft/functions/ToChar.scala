package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PostgreSQL `to_char(timestamp, format)` re-expressed as a composition of
  * Spark's codegen'd `date_format` plus a few derived segments — no UDF in
  * the hot path.
  *
  * Token table and semantics mirror the reference engine
  * (`/root/reference/src/functions.rs:537-775`), including its documented
  * divergences from real Postgres:
  *  - `Month`/`Day` output is unpadded (PG pads to 9 chars);
  *  - token matching is case-sensitive (`yyyy` is NOT `YYYY`);
  *  - unterminated `"…"` literals are copied verbatim rather than erroring;
  *  - `HH` aliases `HH12` (12-hour clock), as in Postgres.
  * PG `D` is day-of-week Sunday=1..Saturday=7 (Spark's `dayofweek` numbering,
  * so it maps directly); `DY` is the uppercased abbreviated weekday.
  */
object ToChar {

  private sealed trait Part
  /** A Spark `date_format` pattern (tokens already translated, literal text
    * single-quote-escaped). */
  private case class JavaFmt(pattern: String) extends Part
  /** PG `D`: day of week, Sunday=1..Saturday=7. */
  private case object PgD extends Part
  /** PG `DY`: uppercase abbreviated weekday (`WED`). */
  private case object PgDY extends Part
  /** PG `am`/`pm`: lowercase meridiem. */
  private case object LowerMeridiem extends Part

  // ORDER IS LOAD-BEARING: a token must precede any token that is its
  // prefix (YYYY before YY, HH24/HH12 before HH, Month before Mon before MM).
  private val tokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy",
    "YY" -> "yy",
    "Month" -> "MMMM",
    "Mon" -> "MMM",
    "MM" -> "MM",
    "DD" -> "dd",
    "Day" -> "EEEE",
    "Dy" -> "EEE",
    "HH24" -> "HH",
    "HH12" -> "hh",
    "HH" -> "hh",
    "MI" -> "mm",
    "SS" -> "ss",
    "US" -> "SSSSSS",
    "MS" -> "SSS",
    // timestamps are stored UTC, so TZ always renders as "UTC"
    "TZ" -> "'UTC'",
    "AM" -> "a",
    "PM" -> "a"
  )

  /** Parse a PG format string into render parts. Literal text is quoted for
    * the Java pattern; `"…"` sections are copied verbatim (with `""` as an
    * escaped quote). Literal letters accumulate into a single quoted run —
    * per-char quoting would make adjacent runs parse as escaped quotes.
    */
  private def parse(fmt: String): Seq[Part] = {
    val parts = Seq.newBuilder[Part]
    val buf = new StringBuilder
    var inQuote = false
    def closeQuote(): Unit = if (inQuote) { buf.append('\''); inQuote = false }
    def pattern(p: String): Unit = { closeQuote(); buf.append(p) }
    def literal(c: Char): Unit = c match {
      // outside a quoted run, '' renders a literal single quote
      case '\'' => closeQuote(); buf.append("''")
      case ch if ch.isLetter =>
        if (!inQuote) { buf.append('\''); inQuote = true }
        buf.append(ch)
      case ch => closeQuote(); buf.append(ch)
    }
    def flush(): Unit = {
      closeQuote()
      if (buf.nonEmpty) { parts += JavaFmt(buf.toString); buf.clear() }
    }
    var i = 0
    while (i < fmt.length) {
      val rest = fmt.substring(i)
      if (fmt.charAt(i) == '"') {
        // literal section until the matching quote; "" is an escaped quote
        i += 1
        var done = false
        while (i < fmt.length && !done) {
          if (fmt.charAt(i) == '"') {
            if (i + 1 < fmt.length && fmt.charAt(i + 1) == '"') { literal('"'); i += 2 }
            else { i += 1; done = true }
          } else { literal(fmt.charAt(i)); i += 1 }
        }
      } else if (rest.startsWith("DY")) {
        flush(); parts += PgDY; i += 2
      } else if (fmt.charAt(i) == 'D' &&
        (i + 1 >= fmt.length || !fmt.charAt(i + 1).isLetterOrDigit)) {
        flush(); parts += PgD; i += 1
      } else if (rest.startsWith("am") || rest.startsWith("pm")) {
        flush(); parts += LowerMeridiem; i += 2
      } else {
        tokens.find { case (pg, _) => rest.startsWith(pg) } match {
          case Some((pg, java)) => pattern(java); i += pg.length
          case None => literal(fmt.charAt(i)); i += 1
        }
      }
    }
    flush()
    parts.result()
  }

  /** Render the parse as a SQL expression template over `tsRef` (used by the
    * SQL-name registration path, which splices parsed expressions instead of
    * Columns).
    */
  def toSqlTemplate(fmt: String, tsRef: String): String = {
    def sq(s: String): String = s.replace("'", "''")
    val pieces = parse(fmt).map {
      case JavaFmt(p) => s"date_format($tsRef, '${sq(p)}')"
      case PgD => s"cast(dayofweek($tsRef) as string)"
      case PgDY => s"upper(date_format($tsRef, 'EEE'))"
      case LowerMeridiem => s"lower(date_format($tsRef, 'a'))"
    }
    pieces match {
      case Seq() => "''"
      case Seq(one) => one
      case many => many.mkString("concat(", ", ", ")")
    }
  }

  /** Column-API `to_char`. The format must be known at plan time (it is a
    * literal in every reference query), which lets the whole expression
    * compile to codegen'd `date_format`/`concat`.
    */
  def toChar(ts: Column, fmt: String): Column = {
    val t = ts.cast("timestamp_ntz")
    val cols = parse(fmt).map {
      case JavaFmt(p) => date_format(t, p)
      case PgD => dayofweek(t).cast("string")
      case PgDY => upper(date_format(t, "EEE"))
      case LowerMeridiem => lower(date_format(t, "a"))
    }
    cols match {
      case Seq() => lit("")
      case Seq(one) => one
      case many => concat(many: _*)
    }
  }
}
