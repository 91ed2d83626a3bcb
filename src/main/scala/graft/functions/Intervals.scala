package graft.functions

/** Interval-string parsing for `time_bucket`.
  *
  * Accepts `'5 minutes'`, `'5m'`, `'2 hours'`, `'1 week'`, … — the grammar
  * of the reference engine's TimescaleDB-compatible parser
  * (`/root/reference/src/functions.rs:1063-1093`).
  */
object Intervals {
  private val unitMicros: Map[String, Long] = {
    val sec = 1000000L
    Seq(
      Seq("second", "seconds", "sec", "secs", "s") -> sec,
      Seq("minute", "minutes", "min", "mins", "m") -> (60L * sec),
      Seq("hour", "hours", "hr", "hrs", "h") -> (3600L * sec),
      Seq("day", "days", "d") -> (86400L * sec),
      Seq("week", "weeks", "w") -> (604800L * sec)
    ).flatMap { case (names, v) => names.map(_ -> v) }.toMap
  }

  /** Parse an interval string to microseconds; throws IllegalArgumentException
    * on malformed input (mirrors the reference's error contract).
    */
  def parseToMicros(interval: String): Long = {
    def fail() = throw new IllegalArgumentException(
      s"Invalid interval format: '$interval'. Expected 'N unit' (e.g. '5 minutes' or '5m')")
    val parts = interval.trim.split("\\s+")
    val (numStr, unitStr) = parts match {
      case Array(v, u) => (v, u)
      case Array(combined) =>
        val i = combined.indexWhere(_.isLetter)
        if (i <= 0) fail()
        (combined.substring(0, i), combined.substring(i))
      case _ => fail()
    }
    val value =
      try numStr.toLong
      catch { case _: NumberFormatException => fail() }
    val micros = unitMicros.getOrElse(unitStr.toLowerCase, fail())
    val out = value * micros
    if (value != 0 && out / value != micros)
      throw new IllegalArgumentException(s"Interval '$interval' overflows")
    out
  }
}
