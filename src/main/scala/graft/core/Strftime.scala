package graft.core

/** Translates the documented subset of Python strftime format codes
  * (which the reference exposes in its datetime APIs — reference:
  * gecko/generator.py:298-305, gecko/mutator.py:1246-1291) to JDK
  * DateTimeFormatter patterns usable with Spark's date_format /
  * to_timestamp. Unsupported codes are rejected loudly
  * (SURVEY.md §7 watch-list item 6). */
object Strftime {

  private val codes: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy",
    'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh",
    'M' -> "mm", 'S' -> "ss",
    'j' -> "DDD",
    'f' -> "SSSSSS", // microseconds, 6-digit zero-padded like Python's
    'p' -> "a",
    'a' -> "EEE", 'A' -> "EEEE",
    'b' -> "MMM", 'B' -> "MMMM")

  /** strftime pattern → JDK DateTimeFormatter pattern. */
  def toJava(fmt: String): String = {
    val out = new StringBuilder
    val literal = new StringBuilder

    def flushLiteral(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        if (s.exists(c => c.isLetter || c == '\''))
          out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
        literal.clear()
      }
    }

    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length)
          throw new IllegalArgumentException(
            s"dangling `%` at end of datetime format `$fmt`")
        val code = fmt.charAt(i + 1)
        if (code == '%') literal.append('%')
        else {
          val jdk = codes.getOrElse(code, throw new IllegalArgumentException(
            s"unsupported strftime code `%$code` in format `$fmt`; " +
              s"supported: ${codes.keys.toSeq.sorted.map(k => s"%$k").mkString(", ")}, %%"))
          flushLiteral()
          out.append(jdk)
        }
        i += 2
      } else {
        literal.append(c)
        i += 1
      }
    }
    flushLiteral()
    out.toString
  }
}
