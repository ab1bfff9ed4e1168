package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the element-wise MINIMUM of MinHash
  * signature arrays — the UDAF surface SURVEY §2.8 calls for, applied to
  * the one aggregation the relational operators can't express cheaply:
  * the minhash of a UNION of sets is the slot-wise min of the sets'
  * signatures, so a GROUP's signature aggregates ASSOCIATIVELY from its
  * members' signatures.
  *
  * That associativity is the scale story: group-vs-group content overlap
  * (which sources mirror each other, how much a new crawl overlaps each
  * existing slice) falls out of ONE partial-agg shuffle over per-doc
  * signatures — map-side combined like any sum — followed by a
  * groups²-sized comparison, with no doc-pair join anywhere. The exact
  * alternative (distinct-shingle sets per group) shuffles the corpus'
  * full shingle relation; at 100 TB the signature route moves
  * `numHashes` hex strings per doc instead.
  *
  * Slots are lexicographic-min md5 hex strings (the engine-portable
  * MinHash family of [[TextFunctions.minhashSigs]]); nulls mark empty
  * accumulators so `zero` needs no sentinel values. Used via
  * `functions.udaf(...)` (q149); bit-equal to a per-slot `MIN` in any
  * SQL engine, which is exactly how the DuckDB oracle mirrors it. */
final class MinSigAggregator(numHashes: Int)
    extends Aggregator[Seq[String], Array[String], Seq[String]] {

  override def zero: Array[String] = new Array[String](numHashes)

  private def minSlot(a: String, b: String): String =
    if (a == null) b
    else if (b == null) a
    else if (a <= b) a else b

  override def reduce(buf: Array[String], sig: Seq[String])
      : Array[String] = {
    var i = 0
    while (i < numHashes) { buf(i) = minSlot(buf(i), sig(i)); i += 1 }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) { a(i) = minSlot(a(i), b(i)); i += 1 }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    Encoders.kryo[Array[String]]

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
