package graft.pipeline

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, ResolverStyle}

/** Pipeline-parameter validation (SURVEY.md §2.9 F5): the reference rejects
  * malformed `from`/`to` dates with a 400 before any work starts
  * ([function_app.py:31-50]). The engine-side analog is strict parse-or-throw
  * at pipeline entry: [[InvalidParam]] is the "400" — a typed error carrying
  * the parameter name and reason, raised before a single Spark job runs.
  */
object Params {

  /** The 400-response analog: which parameter, what value, why. */
  final case class InvalidParam(name: String, value: String, reason: String)
    extends IllegalArgumentException(s"invalid parameter '$name'='$value': $reason")

  // STRICT resolver: uuuu-MM-dd, no lenient day-of-month rollover
  // (2024-02-31 must fail, matching the reference's %Y-%m-%d strptime).
  private val isoDate = DateTimeFormatter.ofPattern("uuuu-MM-dd")
    .withResolverStyle(ResolverStyle.STRICT)

  /** Parse a strict ISO `yyyy-MM-dd` date or throw [[InvalidParam]]. */
  def parseDate(name: String, value: String): LocalDate =
    try LocalDate.parse(value, isoDate)
    catch {
      case _: java.time.format.DateTimeParseException =>
        throw InvalidParam(name, value, "expected ISO date yyyy-MM-dd")
    }

  /** Parse and validate an inclusive [from, to] window: both strict ISO,
    * from <= to ([function_app.py:44-50]).
    */
  def parseDateRange(from: String, to: String): (LocalDate, LocalDate) = {
    val f = parseDate("from", from)
    val t = parseDate("to", to)
    if (f.isAfter(t)) throw InvalidParam("from", from, s"'from' is after 'to' ($to)")
    (f, t)
  }
}
