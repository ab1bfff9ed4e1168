package graft.predicate

import java.time.format.DateTimeFormatter

/** Source/backend dialect renderers for the offload-predicate AST.
  *
  * The Spark path compiles the AST straight to Catalyst (`OffloadPredicate
  * .toColumn`), but two text renderings survive for the same reasons they
  * exist in the reference: the ORACLE rendering is pushed into the JDBC
  * extraction query (`oracle/oracle_predicate.py`), and the BIGQUERY
  * rendering goes into backend verification/DML
  * (`bigquery/bigquery_predicate.py`). Both are dumb, total functions of the
  * typed AST — never string-spliced from user input.
  */
object DialectRenderers {
  import Pred._
  import PredValue._

  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  sealed trait Dialect
  case object Oracle extends Dialect
  case object BigQuery extends Dialect

  private def ident(name: String, d: Dialect): String = d match {
    case Oracle => name.toUpperCase
    case BigQuery => name.toLowerCase
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
}
