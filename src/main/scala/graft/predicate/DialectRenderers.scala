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
}
