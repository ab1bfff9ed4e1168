package graft.types

import java.time.{LocalDate, LocalDateTime, LocalTime, OffsetDateTime}
import java.time.format.DateTimeFormatter

/** Typed-value → backend-literal rendering for the legacy-DDL surface.
  *
  * Mirrors the reference's per-backend `FormatLiteral` classes
  * (`hadoop/hive_literal.py:46-91`, `snowflake/snowflake_literal.py:47-124`,
  * base scale-stripping `format_literal.py:55-70`). These literals go into
  * DDL files and rendered predicates only — the Spark execution path binds
  * values through Catalyst, never through strings.
  *
  * Dialect cheat-sheet (from the reference):
  *  - Hive: `date '…'` / `timestamp '…'` keyword-prefix literals; fractional
  *    seconds are stripped entirely when zero (`trim_unnecessary_subseconds`,
  *    `hive_literal.py:62-66`); strings single-quoted; numerics bare.
  *  - Snowflake: `'…'::DATE` / `'…'::TIMESTAMP_NTZ` / `'…'::TIMESTAMP_TZ` /
  *    `'…'::TIME` cast-suffix literals; fractional seconds stripped to at
  *    least one digit (`snowflake_literal.py:50-57`); a TZ-less timestamp
  *    bound for TIMESTAMP_TZ assumes UTC rendered as an HH:MM offset —
  *    Snowflake rejects named zones (`snowflake_literal.py:84-96`).
  *  - Impala: bare quoted strings with NO keyword prefix — `data_type` is
  *    ignored entirely (`impala_literal.py:42-58`): even a bare date
  *    renders its midnight time part, with zero subseconds trimmed.
  */
object BackendLiterals {

  sealed trait Backend
  case object Hive extends Backend
  case object Snowflake extends Backend
  case object Impala extends Backend

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val secFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val timeFmt = DateTimeFormatter.ofPattern("HH:mm:ss")

  /** `format_literal.py:55-70`: strip trailing fractional zeros; keep one
    * zero digit unless `trimAll`, in which case drop the point too. */
  private[types] def stripScale(s: String, trimAll: Boolean): String =
    if (!s.contains(".")) s
    else {
      val stripped = s.reverse.dropWhile(_ == '0').reverse
      if (stripped.endsWith("."))
        if (trimAll) stripped.dropRight(1) else stripped + "0"
      else stripped
    }

  private def fraction(nanos: Int): String =
    if (nanos == 0) "" else "." + f"$nanos%09d"

  private def quote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Render a typed value as a backend literal. `ctype` disambiguates
    * date-vs-timestamp and NTZ-vs-TZ the same way the reference's
    * `data_type` parameter does; when absent, the value's own type decides
    * (timestamps default to TIMESTAMP / TIMESTAMP_NTZ). */
  def render(v: Any, backend: Backend, ctype: Option[CanonicalType] = None): String =
    (v, backend) match {
      case (null, _) => "NULL"

      case (d: LocalDate, Hive) =>
        ctype match {
          case Some(CanonicalType.Date) => s"date ${quote(d.format(dateFmt))}"
          // a bare date bound for a timestamp column renders midnight with
          // the zero fraction trimmed (hive_literal.py:69-84)
          case _ => s"timestamp ${quote(d.format(dateFmt) + " 00:00:00")}"
        }
      case (t: LocalDateTime, Hive) =>
        ctype match {
          case Some(CanonicalType.Date) =>
            s"date ${quote(t.format(dateFmt))}"
          case _ =>
            val s = stripScale(t.format(secFmt) + fraction(t.getNano), trimAll = true)
            s"timestamp ${quote(s)}"
        }
      case (t: LocalTime, Hive) =>
        // Hive has no TIME type; TIME canonicals carry as plain strings
        quote(stripScale(t.format(timeFmt) + fraction(t.getNano), trimAll = true))

      // Impala ignores the declared type: every temporal renders as a bare
      // quoted timestamp-ish string (impala_literal.py:42-58)
      case (d: LocalDate, Impala) =>
        quote(d.format(dateFmt) + " 00:00:00")
      case (t: LocalDateTime, Impala) =>
        quote(stripScale(t.format(secFmt) + fraction(t.getNano), trimAll = true))
      case (t: LocalTime, Impala) =>
        quote(stripScale(t.format(timeFmt) + fraction(t.getNano), trimAll = true))

      case (d: LocalDate, Snowflake) =>
        ctype match {
          case Some(CanonicalType.TimestampTz) =>
            s"${quote(d.format(dateFmt) + " 00:00:00.000000 +00:00")}::TIMESTAMP_TZ"
          case Some(CanonicalType.Timestamp) =>
            s"${quote(stripScale(d.format(dateFmt) + " 00:00:00.000000", trimAll = false))}::TIMESTAMP_NTZ"
          case _ => s"${quote(d.format(dateFmt))}::DATE"
        }
      case (t: LocalDateTime, Snowflake) =>
        ctype match {
          case Some(CanonicalType.Date) =>
            s"${quote(t.format(dateFmt))}::DATE"
          case Some(CanonicalType.TimestampTz) =>
            // TZ-less values assume UTC, HH:MM offset form (snowflake_literal.py:84-90)
            s"${quote(t.atOffset(java.time.ZoneOffset.UTC).format(
              DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS xxx")))}::TIMESTAMP_TZ"
          case Some(CanonicalType.Time) =>
            s"${quote(t.format(DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")))}::TIME"
          case _ =>
            val s = stripScale(t.format(secFmt) + fraction(t.getNano), trimAll = false)
            s"${quote(s)}::TIMESTAMP_NTZ"
        }
      case (t: OffsetDateTime, Snowflake) =>
        s"${quote(t.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS xxx")))}::TIMESTAMP_TZ"
      case (t: LocalTime, Snowflake) =>
        s"${quote(t.format(DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")))}::TIME"

      case (s: String, _) => quote(s)
      case (b: BigDecimal, _) => b.bigDecimal.toPlainString
      case (d: java.math.BigDecimal, _) => d.toPlainString
      case (other, _) => other.toString
    }

  def hive(v: Any, ctype: Option[CanonicalType] = None): String =
    render(v, Hive, ctype)
  def snowflake(v: Any, ctype: Option[CanonicalType] = None): String =
    render(v, Snowflake, ctype)
  def impala(v: Any, ctype: Option[CanonicalType] = None): String =
    render(v, Impala, ctype)
}
