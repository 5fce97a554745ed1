package graft.core

/** Datetime granularity units supported by the engine. Months/years are
  * deliberately unsupported, mirroring the reference's rationale that
  * they are nonlinear (reference: gecko/_typedefs.py:8,19-39,
  * docs/data-generation.md:188-190). */
sealed abstract class DateTimeUnit(val name: String, val seconds: Long)

object DateTimeUnit {
  case object Days extends DateTimeUnit("days", 86400L)
  case object Hours extends DateTimeUnit("hours", 3600L)
  case object Minutes extends DateTimeUnit("minutes", 60L)
  case object Seconds extends DateTimeUnit("seconds", 1L)

  private val aliases: Map[String, DateTimeUnit] = Map(
    "d" -> Days, "days" -> Days,
    "h" -> Hours, "hours" -> Hours,
    "m" -> Minutes, "minutes" -> Minutes,
    "s" -> Seconds, "seconds" -> Seconds)

  def parse(unit: String): DateTimeUnit =
    aliases.getOrElse(unit, throw new IllegalArgumentException(
      s"unrecognized unit `$unit`, must be one of: " +
        aliases.keys.toSeq.sorted.map(u => s"`$u`").mkString(", ")))
}
