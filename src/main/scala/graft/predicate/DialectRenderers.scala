package graft.predicate

import java.time.format.DateTimeFormatter

/** Source/backend dialect renderers for the offload-predicate AST.
  *
  * The Spark path compiles the AST straight to Catalyst (`OffloadPredicate
  * .toColumn`), but text renderings survive for the same reasons they exist
  * in the reference: the ORACLE rendering is pushed into the JDBC
  * extraction query (`oracle/oracle_predicate.py`), the BIGQUERY rendering
  * goes into backend verification/DML (`bigquery/bigquery_predicate.py`),
  * and the TERADATA / SYNAPSE(MSSQL) renderings mirror the reference's
  * partial frontends (`teradata/teradata_literal.py`,
  * `microsoft/synapse_predicate.py` + `synapse_literal.py`). All are dumb,
  * total functions of the typed AST — never string-spliced from user input.
  *
  * Dialect cheat-sheet (from the reference):
  *  - Teradata: `"IDENT"` double-quoted uppercase identifiers
  *    (`teradata_frontend_api.py:596-606`), `DATE '...'` /
  *    `TIMESTAMP 'y-M-d H:m:s.f'` literals with trailing-zero scale
  *    stripped to at least one digit (`teradata_literal.py:62-75`,
  *    `format_literal.py:56-68`), `SELECT TOP n` with no parentheses
  *    (`teradata_offload_source_table.py:855-869`).
  *  - Synapse: `[ident]` bracket identifiers (`synapse_predicate.py:52-54`,
  *    `synapse_backend_api.py:1271-1274`), bare quoted date/datetime
  *    strings with no type keyword — "disappointingly primitive"
  *    (`synapse_literal.py:69-84`), `SELECT TOP(n)` with parentheses
  *    (`synapse_backend_table.py:407-409`).
  */
object DialectRenderers {
  import Pred._
  import PredValue._

  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  sealed trait Dialect
  case object Oracle extends Dialect
  case object BigQuery extends Dialect
  case object Teradata extends Dialect
  case object Synapse extends Dialect

  private def ident(name: String, d: Dialect): String = d match {
    case Oracle => name.toUpperCase
    case BigQuery => name.toLowerCase
    case Teradata => "\"" + name.toUpperCase.replace("\"", "\"\"") + "\""
    case Synapse => "[" + name.replace("]", "]]") + "]"
  }

  /** Fractional-seconds rendering shared by Teradata/Synapse: the reference
    * strips trailing zeros but keeps at least one digit
    * (`format_literal.py:56-68`, "2030-01-02 00:00:00.000003000" would
    * otherwise be rejected). */
  private def tsWithScale(t: java.time.LocalDateTime): String = {
    val base = t.format(ts)
    val frac = f"${t.getNano}%09d".reverse.dropWhile(_ == '0').reverse
    base + "." + (if (frac.isEmpty) "0" else frac)
  }

  private def value(v: PredValue, d: Dialect): String = v match {
    case Num(n) => n.bigDecimal.toPlainString
    case Str(s) => "'" + s.replace("'", "''") + "'"
    case Dt(t, dateOnly) =>
      d match {
        case Oracle =>
          if (dateOnly) s"DATE '${t.toLocalDate}'"
          else s"TIMESTAMP '${t.format(ts)}'"
        case BigQuery =>
          if (dateOnly) s"DATE '${t.toLocalDate}'"
          else s"DATETIME '${t.format(ts)}'"
        case Teradata =>
          if (dateOnly) s"DATE '${t.toLocalDate}'"
          else s"TIMESTAMP '${tsWithScale(t)}'"
        case Synapse => // no date/datetime keyword in the Synapse dialect
          if (dateOnly) s"'${t.toLocalDate}'"
          else s"'${tsWithScale(t)}'"
      }
  }

  def render(p: Pred, d: Dialect): String = p match {
    case Cmp(c, "!=", v) => s"${ident(c, d)} != ${value(v, d)}"
    case Cmp(c, op, v)   => s"${ident(c, d)} $op ${value(v, d)}"
    case In(c, vs, neg) =>
      val not = if (neg) "NOT " else ""
      s"${ident(c, d)} ${not}IN (${vs.map(value(_, d)).mkString(", ")})"
    case IsNull(c, neg) =>
      s"${ident(c, d)} IS ${if (neg) "NOT " else ""}NULL"
    case And(l, r) => s"(${render(l, d)} AND ${render(r, d)})"
    case Or(l, r)  => s"(${render(l, d)} OR ${render(r, d)})"
  }

  def oracle(p: Pred): String = render(p, Oracle)
  def bigquery(p: Pred): String = render(p, BigQuery)
  def teradata(p: Pred): String = render(p, Teradata)
  def synapse(p: Pred): String = render(p, Synapse)

  /** Dialect-correct row-limited SELECT: TOP-N is syntax, not a clause, on
    * the MSSQL family — `TOP(n)` for Synapse, bare `TOP n` for Teradata —
    * while Oracle/BigQuery limit at the end (`FETCH FIRST`/`LIMIT`). */
  def limitSelect(d: Dialect, projection: String, from: String,
                  where: Option[String], n: Long): String = {
    require(n > 0, s"row limit must be positive: $n")
    val w = where.map(" WHERE " + _).getOrElse("")
    d match {
      case Teradata => s"SELECT TOP $n $projection FROM $from$w"
      case Synapse  => s"SELECT TOP($n) $projection FROM $from$w"
      case Oracle   =>
        s"SELECT $projection FROM $from$w FETCH FIRST $n ROWS ONLY"
      case BigQuery => s"SELECT $projection FROM $from$w LIMIT $n"
    }
  }

  /** Bind-mode rendering (reference `TypedPredicateToBinds`,
    * `predicate_offload.py:566-587`): values leave the SQL text as named
    * placeholders (`:bind_N` for Oracle, `@bind_N` for BigQuery named
    * parameters) and arrive in an ordered parameter map — the extraction
    * query becomes plan-cacheable on the source and immune to literal
    * injection, which matters when the same predicate shape runs once per
    * partition chunk. The same map drives Spark's parameterized SQL
    * (`spark.sql(sql, args)`) with `:bind_N` placeholders. */
  final case class BindSql(sql: String, binds: Seq[(String, Any)]) {
    def bindMap: Map[String, Any] = binds.toMap
  }

  private def bindValue(v: PredValue): Any = v match {
    case Num(n) => n.bigDecimal
    case Str(s) => s
    case Dt(t, dateOnly) =>
      if (dateOnly) java.sql.Date.valueOf(t.toLocalDate)
      else java.sql.Timestamp.valueOf(t)
  }

  def renderWithBinds(p: Pred, d: Dialect): BindSql = {
    val acc = Seq.newBuilder[(String, Any)]
    var n = 0
    def nextBind(v: PredValue): String = {
      val name = s"bind_$n"; n += 1
      acc += name -> bindValue(v)
      d match {
        case Oracle => ":" + name
        case BigQuery => "@" + name
        // Teradata/MSSQL go through ODBC/JDBC positional markers; the
        // ordered binds seq IS the positional parameter list.
        case Teradata | Synapse => "?"
      }
    }
    def go(p: Pred): String = p match {
      case Cmp(c, "!=", v) => s"${ident(c, d)} != ${nextBind(v)}"
      case Cmp(c, op, v)   => s"${ident(c, d)} $op ${nextBind(v)}"
      case In(c, vs, neg) =>
        val not = if (neg) "NOT " else ""
        s"${ident(c, d)} ${not}IN (${vs.map(nextBind).mkString(", ")})"
      case IsNull(c, neg) => // no value, no bind
        s"${ident(c, d)} IS ${if (neg) "NOT " else ""}NULL"
      case And(l, r) => s"(${go(l)} AND ${go(r)})"
      case Or(l, r)  => s"(${go(l)} OR ${go(r)})"
    }
    val sql = go(p)
    BindSql(sql, acc.result())
  }

  def oracleBinds(p: Pred): BindSql = renderWithBinds(p, Oracle)
  def bigqueryBinds(p: Pred): BindSql = renderWithBinds(p, BigQuery)
  def teradataBinds(p: Pred): BindSql = renderWithBinds(p, Teradata)
  def synapseBinds(p: Pred): BindSql = renderWithBinds(p, Synapse)
}
