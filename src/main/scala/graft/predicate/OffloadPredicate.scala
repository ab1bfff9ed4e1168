package graft.predicate

import java.time.{LocalDate, LocalDateTime}
import java.time.format.DateTimeFormatter

import scala.util.parsing.combinator.RegexParsers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Offload-predicate DSL — typed AST.
  *
  * Same surface language as the reference's lark grammar
  * (`src/goe/offload/predicate_offload.py:666-731`, examples at `:38-90`):
  *
  * {{{
  * (column(L_SHIPDATE) < datetime(1995-01-01)) AND
  *   (column(L_RETURNFLAG) IN (string("R"), string("A")))
  * }}}
  *
  * Re-expressed for Spark: instead of rendering to Oracle/BigQuery SQL text,
  * the AST compiles to a Catalyst `Column` (so Catalyst pushes it into the
  * parquet/JDBC scan for free — `PushedFilters` in `.explain`), plus SQL
  * renderers for engines we must address as text (DuckDB verification oracle,
  * JDBC source pushdown strings).
  */
sealed trait PredValue
object PredValue {
  final case class Num(v: BigDecimal)      extends PredValue
  final case class Str(v: String)          extends PredValue
  final case class Dt(v: LocalDateTime, dateOnly: Boolean) extends PredValue
}

sealed trait Pred
object Pred {
  final case class Cmp(column: String, op: String, value: PredValue) extends Pred
  final case class In(column: String, values: Seq[PredValue], negated: Boolean) extends Pred
  final case class IsNull(column: String, negated: Boolean) extends Pred
  final case class And(l: Pred, r: Pred) extends Pred
  final case class Or(l: Pred, r: Pred)  extends Pred
}

object OffloadPredicate {
  import Pred._
  import PredValue._

  // ---------------------------------------------------------------- parser
  private object P extends RegexParsers {
    def ident: Parser[String] = """[A-Za-z_][A-Za-z0-9_$#]*""".r
    def columnRef: Parser[String] = "column" ~> "(" ~> ident <~ ")"

    def numeric: Parser[PredValue] =
      "numeric" ~> "(" ~> """[-+]?\d+(\.\d+)?([eE][-+]?\d+)?""".r <~ ")" ^^
        (s => Num(BigDecimal(s)))
    def str: Parser[PredValue] =
      "string" ~> "(" ~> "\"" ~> """[^"]*""".r <~ "\"" <~ ")" ^^ (Str(_))
    def datetime: Parser[PredValue] =
      "datetime" ~> "(" ~> """\d{4}-\d{2}-\d{2}( \d{2}:\d{2}:\d{2}(\.\d+)?)?""".r <~ ")" ^^ { s =>
        if (s.length == 10)
          Dt(LocalDate.parse(s).atStartOfDay, dateOnly = true)
        else {
          val fmt =
            if (s.contains('.')) DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
            else DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
          Dt(LocalDateTime.parse(s, fmt), dateOnly = false)
        }
      }
    def value: Parser[PredValue] = numeric | str | datetime

    def cmpOp: Parser[String] = "!=" | ">=" | "<=" | "=" | ">" | "<"

    def cmp: Parser[Pred] = columnRef ~ cmpOp ~ value ^^ {
      case c ~ op ~ v => Cmp(c, op, v)
    }
    def inList: Parser[Pred] =
      columnRef ~ ("NOT" ~ "IN" ^^^ true | "IN" ^^^ false) ~
        ("(" ~> rep1sep(value, ",") <~ ")") ^^ {
        case c ~ neg ~ vs => In(c, vs, neg)
      }
    def nullCheck: Parser[Pred] =
      columnRef ~ ("IS" ~> opt("NOT") <~ "NULL") ^^ {
        case c ~ neg => IsNull(c, neg.isDefined)
      }
    def simple: Parser[Pred] = inList | nullCheck | cmp

    // The reference grammar requires parentheses around each AND/OR operand —
    // keeps precedence unambiguous without a precedence table.
    def group: Parser[Pred] = "(" ~> expr <~ ")"
    def term: Parser[Pred] = group | simple
    def expr: Parser[Pred] = term ~ rep(("AND" | "OR") ~ term) ^^ {
      case t ~ rest => rest.foldLeft(t) {
        case (acc, "AND" ~ r) => And(acc, r)
        case (acc, _ ~ r)     => Or(acc, r)
      }
    }
    def parseAll(s: String): Either[String, Pred] =
      this.parse(phrase(expr), s) match {
        case Success(p, _)   => Right(p)
        case NoSuccess(m, in) => Left(s"$m at ${in.pos}")
        case other            => Left(other.toString)
      }
  }

  def parse(dsl: String): Either[String, Pred] = P.parseAll(dsl)

  def parseUnsafe(dsl: String): Pred =
    parse(dsl).fold(e => throw new IllegalArgumentException(e), identity)

  // ------------------------------------------------------------- compilers
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def valueColumn(v: PredValue): Column = v match {
    case Num(n) => lit(n.underlying)
    case Str(s) => lit(s)
    case Dt(d, dateOnly) =>
      if (dateOnly) to_date(lit(d.toLocalDate.toString))
      else to_timestamp(lit(d.format(tsFmt)))
  }

  /** Compile to a Catalyst `Column`; Catalyst then pushes it down
    * (replaces the reference's per-dialect SQL renderers
    * `oracle/oracle_predicate.py`, `bigquery/bigquery_predicate.py`). */
  def toColumn(p: Pred): Column = p match {
    case Cmp(c, "=", v)  => col(c) === valueColumn(v)
    case Cmp(c, "!=", v) => col(c) =!= valueColumn(v)
    case Cmp(c, "<", v)  => col(c) < valueColumn(v)
    case Cmp(c, "<=", v) => col(c) <= valueColumn(v)
    case Cmp(c, ">", v)  => col(c) > valueColumn(v)
    case Cmp(c, ">=", v) => col(c) >= valueColumn(v)
    case Cmp(_, op, _)   => throw new IllegalArgumentException(s"op $op")
    case In(c, vs, neg) =>
      val in = col(c).isInCollection(vs.map {
        case Num(n) => n.underlying
        case Str(s) => s
        case Dt(d, dateOnly) =>
          if (dateOnly) java.sql.Date.valueOf(d.toLocalDate)
          else java.sql.Timestamp.valueOf(d)
      })
      if (neg) !in else in
    case IsNull(c, neg) => if (neg) col(c).isNotNull else col(c).isNull
    case And(l, r) => toColumn(l) && toColumn(r)
    case Or(l, r)  => toColumn(l) || toColumn(r)
  }

  def columnOf(dsl: String): Column = toColumn(parseUnsafe(dsl))

  // --------------------------------------------------------- SQL renderer
  private def sqlValue(v: PredValue): String = v match {
    case Num(n) => n.bigDecimal.toPlainString
    case Str(s) => "'" + s.replace("'", "''") + "'"
    case Dt(d, true)  => s"DATE '${d.toLocalDate}'"
    case Dt(d, false) => s"TIMESTAMP '${d.format(tsFmt)}'"
  }

  /** Render to ANSI SQL (DuckDB-compatible) — used for the verification
    * oracle so both engines evaluate the *same* predicate AST. */
  def toSql(p: Pred): String = p match {
    case Cmp(c, "!=", v) => s"$c <> ${sqlValue(v)}"
    case Cmp(c, op, v)   => s"$c $op ${sqlValue(v)}"
    case In(c, vs, neg) =>
      val not = if (neg) "NOT " else ""
      s"$c ${not}IN (${vs.map(sqlValue).mkString(", ")})"
    case IsNull(c, neg) => s"$c IS ${if (neg) "NOT " else ""}NULL"
    case And(l, r) => s"(${toSql(l)}) AND (${toSql(r)})"
    case Or(l, r)  => s"(${toSql(l)}) OR (${toSql(r)})"
  }

  /** Columns referenced by the predicate — powers synthetic-partition
    * predicate injection (which needs to know whether the partition source
    * column is constrained). */
  def referencedColumns(p: Pred): Set[String] = p match {
    case Cmp(c, _, _)   => Set(c)
    case In(c, _, _)    => Set(c)
    case IsNull(c, _)   => Set(c)
    case And(l, r)      => referencedColumns(l) ++ referencedColumns(r)
    case Or(l, r)       => referencedColumns(l) ++ referencedColumns(r)
  }
}
