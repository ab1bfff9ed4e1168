package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exception-free equivalents of hot `try_cast` shapes.
  *
  * Spark evaluates TRY-mode casts by running the ANSI cast and catching
  * the failure — a thrown-and-caught JVM exception PER FAILING ROW
  * (~13 µs each, measured: q18's all-rows-fail probes cost ~2 s per
  * 150k-row probe at sf0.1 while the all-rows-succeed probe costs
  * 0.05 s). A validation probe whose POINT is counting failures
  * (`castViolations`, q18) therefore pays the pathological path on
  * every violating row — at 10¹¹ rows that is the difference between a
  * scan-bound probe and an exception-bound one.
  *
  * Each helper here guards the cast with a cheap codegen'd predicate so
  * the common rows never enter the throwing path, and ROUTES EVERY
  * AMBIGUOUS ROW TO THE REAL `try_cast` — the guards only claim rows
  * whose outcome is provable, so the result is bit-identical to
  * `try_cast` for every input (spec-pinned in SafeCastsSpec, including
  * the whitespace/control-char trimming corners).
  */
object SafeCasts {

  /** The ANSI numeric parser trims exactly the SINGLE-BYTE whitespace /
    * ISO-control characters — 0x00-0x20 and 0x7F (DEL). Multi-byte
    * characters are never trimmed even when Character.isWhitespace /
    * isISOControl holds (NEL U+0085, THIN SPACE U+2009, NBSP — all
    * spec-pinned corners: try_cast("12<NEL>") is null while
    * try_cast("12<DEL>") is 12). A character outside
    * [\x00-\x20\x7F + - 0-9] can neither be trimmed nor be part of an
    * integral literal, so its presence proves the string→int cast
    * fails. */
  private val DisqualifyingChar = "[^\\x00-\\x20\\x7F+\\-0-9]"

  /** Nothing but trimmable bytes: trims to the empty string, which the
    * parser rejects — provably null. */
  private val AllTrimmable = "\\A[\\x00-\\x20\\x7F]*\\z"

  /** Sign + ≤9 digits (optionally padded by trimmable bytes) always fits
    * an INT and is accepted verbatim by the ANSI parser — the cast
    * provably succeeds. \A/\z anchors, NOT ^/$: Java's `$` also matches
    * before a FINAL LINE TERMINATOR (\n, \r, NEL U+0085, LS U+2028), which
    * the parser does not trim — "12<NEL>" must not take this branch. */
  private val PlainInt =
    "\\A[\\x00-\\x20\\x7F]*[+-]?[0-9]{1,9}[\\x00-\\x20\\x7F]*\\z"

  /** `s.try_cast("int")` for a STRING column, without the per-row
    * exception on non-numeric rows. Three-way split:
    *   - provably parses (sign + ≤9 digits): plain `cast` — never throws;
    *   - provably fails (contains a character that is neither a
    *     trimmable byte nor sign/digit, or is all-trimmable): literal
    *     NULL;
    *   - anything else (10+ digits near the INT boundary, doubled
    *     signs): the real `try_cast` — rare by construction.
    */
  def tryStringToInt(s: Column): Column =
    when(s.rlike(PlainInt), s.cast("int"))
      .when(s.rlike(DisqualifyingChar) || s.rlike(AllTrimmable),
        lit(null).cast("int"))
      .otherwise(s.try_cast("int"))

  /** `d.try_cast(s"decimal($p,$s)")` for a DECIMAL input of the SAME
    * scale, without the per-row exception on overflow rows. With equal
    * scales no rounding can occur, so the try_cast is null exactly when
    * |d| exceeds the target's capacity — a pure range predicate. */
  def tryNarrowDecimalSameScale(d: Column, p: Int, s: Int): Column = {
    require(p >= 1 && s >= 0 && s < p, s"invalid decimal($p,$s)")
    // max representable value: 10^(p-s) - 10^-s, e.g. 999.99 for (5,2)
    val bound = new java.math.BigDecimal(java.math.BigInteger.TEN.pow(p - s))
      .subtract(java.math.BigDecimal.ONE.scaleByPowerOfTen(-s))
    val target = s"decimal($p,$s)"
    when(d.between(lit(bound.negate()), lit(bound)), d.cast(target))
      .otherwise(lit(null).cast(target))
  }
}
