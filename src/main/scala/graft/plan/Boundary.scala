package graft.plan

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-column lexicographic high-water-mark boundary clauses.
  *
  * Incremental (RANGE) offloads track a composite HWM; "rows beyond the HWM"
  * is the lexicographic comparison expanded to OR-of-ANDs:
  * `(c1 > h1) OR (c1 = h1 AND c2 > h2) OR ...` — reference
  * `src/goe/offload/offload_functions.py:199-373` (and the `<` mirror used by
  * verification, `offload_validation.py:90-256`). MAXVALUE sentinel: a
  * partition bound of MAXVALUE compares greater than everything
  * (`offload_functions.py:293-338`).
  *
  * Two formulations:
  *  - [[greaterThan]]/[[lessThan]]: explicit OR-of-ANDs (works everywhere,
  *    renders to any SQL dialect);
  *  - [[structGreaterThan]]: `struct(c...) > struct(lit...)` — Catalyst
  *    compares structs lexicographically natively, which keeps the predicate
  *    a single comparison node (friendlier to pushdown and codegen).
  */
object Boundary {

  sealed trait Bound
  final case class Value(lit: Any) extends Bound
  case object MaxValue extends Bound

  private def cmpChain(cols: Seq[String], bounds: Seq[Bound],
                       strictOp: (Column, Column) => Column): Column = {
    require(cols.length == bounds.length && cols.nonEmpty)
    val disjuncts = cols.indices.map { i =>
      val eqPrefix = (0 until i).map { j =>
        bounds(j) match {
          case Value(v) => col(cols(j)) === lit(v)
          case MaxValue => lit(false) // nothing equals MAXVALUE
        }
      }
      val last = bounds(i) match {
        case Value(v) => strictOp(col(cols(i)), lit(v))
        case MaxValue => lit(false) // nothing is beyond MAXVALUE
      }
      (eqPrefix :+ last).reduce(_ && _)
    }
    disjuncts.reduce(_ || _)
  }

  /** Rows strictly beyond the HWM (candidates for the next offload). */
  def greaterThan(cols: Seq[String], bounds: Seq[Bound]): Column =
    cmpChain(cols, bounds, _ > _)

  /** Rows strictly below the boundary (the already-offloaded slice; the
    * verification side of the hybrid threshold clause). MAXVALUE ⇒ all rows
    * qualify at that position. */
  def lessThan(cols: Seq[String], bounds: Seq[Bound]): Column = {
    require(cols.length == bounds.length && cols.nonEmpty)
    val disjuncts = cols.indices.map { i =>
      val eqPrefix = (0 until i).map { j =>
        bounds(j) match {
          case Value(v) => col(cols(j)) === lit(v)
          case MaxValue => lit(false)
        }
      }
      val last = bounds(i) match {
        case Value(v) => col(cols(i)) < lit(v)
        case MaxValue => col(cols(i)).isNotNull // everything is < MAXVALUE
      }
      (eqPrefix :+ last).reduce(_ && _)
    }
    disjuncts.reduce(_ || _)
  }

  /** Rows at or below the boundary — the LIST_AS_RANGE threshold clause,
    * where the recorded HWM is a like-for-like partition VALUE (inclusive),
    * not an exclusive RANGE bound (reference
    * `offload_source_data.py:2988-2994,3167-3177`). Lexicographic `<=`:
    * strictly below on a prefix, or equal on every column. */
  def lessOrEqual(cols: Seq[String], bounds: Seq[Bound]): Column = {
    val allEqual = cols.indices.map { i =>
      bounds(i) match {
        case Value(v) => col(cols(i)) === lit(v)
        case MaxValue => lit(false)
      }
    }.reduce(_ && _)
    lessThan(cols, bounds) || allEqual
  }

  /** Single-node lexicographic comparison via struct ordering. Only valid
    * when no bound is MAXVALUE. */
  def structGreaterThan(cols: Seq[String], values: Seq[Any]): Column =
    struct(cols.map(col): _*) > struct(values.map(lit): _*)

  /** LIST-partition membership (IN-list boundary,
    * `offload_functions.py:376-449`). */
  def inList(column: String, values: Seq[Any]): Column =
    col(column).isInCollection(values)

  /** ANSI/DuckDB SQL rendering of [[greaterThan]] for the oracle side. */
  object Sql {
    def render(v: Any): String = v match {
      case s: String => "'" + s.replace("'", "''") + "'"
      case d: java.time.LocalDate => s"DATE '$d'"
      case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString.stripSuffix(".0")}'"
      case other => other.toString
    }
    /** Tuple-greater-than over ALREADY-RENDERED literals (the form
      * metadata persists in `incremental_high_value`): the residual-side
      * clause of a hybrid view. MAXVALUE literals mark the slot unbounded. */
    def greaterThanLiterals(cols: Seq[String], lits: Seq[String]): String = {
      require(cols.length == lits.length && cols.nonEmpty,
        s"keys/values mismatch: $cols vs $lits")
      val disjuncts = cols.indices.flatMap { i =>
        val prefixOk = (0 until i).forall(j => lits(j) != "MAXVALUE")
        if (lits(i) == "MAXVALUE" || !prefixOk) None
        else {
          val eqs = (0 until i).map(j => s"${cols(j)} = ${lits(j)}")
          Some((eqs :+ s"${cols(i)} > ${lits(i)}").mkString("(", " AND ", ")"))
        }
      }
      if (disjuncts.isEmpty) "FALSE" else disjuncts.mkString(" OR ")
    }

    def greaterThan(cols: Seq[String], bounds: Seq[Bound]): String = {
      val disjuncts = cols.indices.flatMap { i =>
        val prefixOk = (0 until i).forall(j => bounds(j) != MaxValue)
        bounds(i) match {
          case MaxValue => None
          case Value(v) if prefixOk =>
            val eqs = (0 until i).map { j =>
              val Value(w) = bounds(j): @unchecked
              s"${cols(j)} = ${render(w)}"
            }
            Some((eqs :+ s"${cols(i)} > ${render(v)}").mkString("(", " AND ", ")"))
          case _ => None
        }
      }
      if (disjuncts.isEmpty) "FALSE" else disjuncts.mkString(" OR ")
    }
  }
}
