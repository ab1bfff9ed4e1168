package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` keeping the K smallest DISTINCT longs seen — the
  * accumulator behind the KMV (k-minimum-values) distinct-count sketch
  * ([[graft.operators.Sketches.kmvSketch]]).
  *
  * Why an Aggregator and not relational ops: "bottom-k distinct per
  * group" expressed relationally is a distinct shuffle plus a per-group
  * rank window over the full distinct-value relation — at 100 TB that
  * window sorts billions of hashes per group to keep 64 of them. This
  * accumulator is ASSOCIATIVE with state bounded at K longs, so Spark
  * map-side-combines it like a sum: one partial-agg shuffle moves at most
  * K values per (partition, group), never the value relation. Same scale
  * argument as [[MinSigAggregator]] (the union-minhash UDAF).
  *
  * The buffer is a sorted ascending array of distinct values, length ≤ K;
  * inserting dedups (KMV is a sketch of a SET — re-observing a value must
  * not occupy a second slot). Deterministic for any input order, which is
  * what lets the DuckDB oracle mirror it with a plain rank-≤-K window.
  */
final class BottomKAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 1, "k must be positive")

  override def zero: Array[Long] = Array.empty[Long]

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) buf // already present — a set sketch, not a multiset
    else {
      val ins = -pos - 1
      if (buf.length < k) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
        out
      } else buf // v larger than the current kth minimum — not a bottom-k
    }
  }

  override def reduce(buf: Array[Long], v: Long): Array[Long] =
    insert(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
