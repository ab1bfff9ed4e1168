package graft.plan

/** Partition planning model + incremental planners.
  *
  * Pure-Scala re-expression of the reference's partition algebra: the
  * `RdbmsPartition`/`OffloadSourcePartitions` model
  * (`src/goe/offload/offload_source_table.py:121-190`,
  * `offload_source_data.py:374-709`) and the planner family
  * (Full / RangeIpa / ListIpa / Predicate —
  * `offload_source_data.py:138-247` and classes at 1316/1880/2988).
  *
  * Planning is metadata-only (no data scan): at 100 TB the planner decides
  * WHICH partitions to read before any I/O happens, so incremental offloads
  * touch only the new slice. Data-side pruning then happens again inside
  * Spark via partition/predicate pushdown — two independent layers of
  * pruning, same as the reference.
  */
final case class SourcePartition(
    name: String,
    position: Int,
    highValues: Seq[Boundary.Bound], // upper-exclusive bound per key column
    bytes: Long,
    rows: Long,
    // Composite partitioning: each subpartition carries ITS OWN boundary
    // (`get_subpartition_boundary_info`,
    // `oracle_offload_source_table.py:1300-1330`); planners consuming
    // subpartition grain flatten these (reference `offload_by_subpartition`,
    // `offload_source_data.py:447-452`).
    subpartitions: Seq[SourcePartition] = Nil)

final case class PartitionChunk(partitions: Seq[SourcePartition]) {
  def bytes: Long = partitions.map(_.bytes).sum
  def rows: Long = partitions.map(_.rows).sum
  def names: Seq[String] = partitions.map(_.name)
}

object PartitionPlanner {
  import Boundary._

  /** Order by partition position (the reference keeps catalog order, which
    * for RANGE partitioning is boundary order). */
  def sorted(ps: Seq[SourcePartition]): Seq[SourcePartition] =
    ps.sortBy(_.position)

  private def boundGreater(a: Seq[Bound], b: Seq[Bound]): Boolean = {
    // lexicographic compare of bound vectors; MAXVALUE > everything
    (a zip b).foreach {
      case (MaxValue, MaxValue) => ()
      case (MaxValue, _) => return true
      case (_, MaxValue) => return false
      case (Value(x), Value(y)) =>
        val c = compareAny(x, y)
        if (c != 0) return c > 0
    }
    false
  }

  /** Engine-wide value comparator for partition boundary literals (also
    * consumed by the status report's retention analysis). */
  def compareAny(x: Any, y: Any): Int = (x, y) match {
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b)
    case (a: Number, b: Number) =>
      java.lang.Double.compare(a.doubleValue, b.doubleValue)
    case (a: String, b: String) => a.compareTo(b)
    case (a: Comparable[_], b) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ => throw new IllegalArgumentException(s"incomparable: $x vs $y")
  }

  /** RANGE incremental planning (`offload_data_detection`,
    * `offload_source_data.py:1856+`): partitions whose high value exceeds the
    * already-offloaded HWM, optionally capped by a user `--less-than-value`.
    */
  def rangeIpa(
      all: Seq[SourcePartition],
      offloadedHwm: Option[Seq[Bound]],
      lessThan: Option[Seq[Bound]]): Seq[SourcePartition] = {
    val beyondHwm = offloadedHwm match {
      case None => sorted(all)
      case Some(hwm) => sorted(all).filter(p => boundGreater(p.highValues, hwm))
    }
    lessThan match {
      case None => beyondHwm
      case Some(cap) => beyondHwm.filter(p => !boundGreater(p.highValues, cap))
    }
  }

  /** LIST incremental planning: partitions whose value-list is not already in
    * the offloaded set (set-difference on names/values,
    * `offload_source_data.py:866-882`). */
  def listIpa(all: Seq[SourcePartition], offloadedNames: Set[String])
      : Seq[SourcePartition] =
    sorted(all).filterNot(p => offloadedNames.contains(p.name))

  /** LIST-as-RANGE incremental planning
    * (`OffloadSourceDataIpaListAsRange`, `offload_source_data.py:2988-3030`):
    * tables LIST-partitioned to mimic RANGE. Two deltas from [[rangeIpa]],
    * straight from the reference's class docstring: (1) partitions are
    * sorted by HIGH VALUE, not catalog position — LIST catalog order is
    * arbitrary; (2) the HWM match is like-for-like INCLUSIVE
    * (`offload_source_data.py:3167-3177`: offloaded ⇔ value <= target max)
    * because a LIST partition's "high value" IS its data, not an exclusive
    * bound — the derived threshold clause renders `col <= hwm`
    * ([[Boundary.lessOrEqual]], predicate type LIST_AS_RANGE). The user cap
    * is `--less-than-value`'s inclusive sibling (`less_or_equal_value`). */
  def listAsRangeIpa(
      all: Seq[SourcePartition],
      offloadedHwm: Option[Seq[Bound]],
      lessOrEqual: Option[Seq[Bound]]): Seq[SourcePartition] = {
    val ordered = all.sortWith((a, b) => boundGreater(b.highValues, a.highValues))
    val beyond = offloadedHwm match {
      case None => ordered
      case Some(hwm) => ordered.filter(p => boundGreater(p.highValues, hwm))
    }
    lessOrEqual match {
      case None => beyond
      case Some(cap) => beyond.filter(p => !boundGreater(p.highValues, cap))
    }
  }

  /** Flatten a composite-partitioned catalog to subpartition grain
    * (reference `offload_by_subpartition`: the planner swaps
    * `get_partitions` for `get_subpartitions`,
    * `offload_source_data.py:447-452`). */
  def subpartitionGrain(all: Seq[SourcePartition]): Seq[SourcePartition] =
    sorted(all).flatMap(p => sorted(p.subpartitions))

  /** Common-boundary map (`get_subpartition_boundary_info`,
    * `oracle_offload_source_table.py:1300-1330`): a subpartition HWM vector
    * is COMMON when every top-level partition contributes a subpartition
    * with exactly that boundary — only common boundaries are safe
    * incremental HWMs, because a non-common one would leave some top-level
    * partitions half-offloaded with no expressible threshold clause. */
  def commonBoundaries(all: Seq[SourcePartition]): Map[Seq[Bound], Boolean] = {
    val withSubs = all.filter(_.subpartitions.nonEmpty)
    val expected = withSubs.size
    withSubs
      .flatMap(p => p.subpartitions.map(s => s.highValues -> p.name))
      .groupBy(_._1)
      .map { case (hv, pairs) =>
        hv -> (pairs.map(_._2).distinct.size == expected)
      }
  }

  /** Subpartition-granular RANGE planning with the reference's common-
    * boundary guard (`_check_hwm_is_a_valid_boundary`,
    * `offload_source_data.py:2196-2250`): plan beyond the HWM at
    * subpartition grain, then require the implied NEW HWM (highest planned
    * boundary) to be (a) a common boundary and (b) not the last boundary in
    * the table — otherwise incremental subpartition offload is unsafe and
    * the caller must fall back to FULL (the reference raises with exactly
    * that instruction). */
  def subpartitionRangeIpa(
      all: Seq[SourcePartition],
      offloadedHwm: Option[Seq[Bound]],
      lessThan: Option[Seq[Bound]]): Either[String, Seq[SourcePartition]] = {
    val subs = subpartitionGrain(all)
    val planned = subs.filter { p =>
      offloadedHwm.forall(hwm => boundGreater(p.highValues, hwm)) &&
      lessThan.forall(cap => !boundGreater(p.highValues, cap))
    }
    if (planned.isEmpty) Right(Nil)
    else {
      val newHwm = planned.map(_.highValues)
        .reduce((a, b) => if (boundGreater(a, b)) a else b)
      val retained = subs.exists(p => boundGreater(p.highValues, newHwm))
      val common = commonBoundaries(all).getOrElse(newHwm, false)
      if (common && retained) Right(planned)
      else Left(
        "Table is not valid for range subpartition offloading due to " +
        "incompatible high value boundaries. Offload with --offload-type=FULL")
    }
  }

  /** Greedy chunking under size/count caps, never splitting partitions that
    * share an identical HWM vector (they must land atomically so metadata can
    * record a consistent HWM — `offload_source_data.py:1273-1310`). */
  def chunk(ps: Seq[SourcePartition], maxBytes: Long, maxCount: Int)
      : Seq[PartitionChunk] = {
    require(maxBytes > 0 && maxCount > 0)
    // group partitions that share a HWM (must stay together)
    val groups: Seq[Seq[SourcePartition]] =
      sorted(ps).foldLeft(Vector.empty[Vector[SourcePartition]]) {
        case (acc, p) =>
          if (acc.nonEmpty && acc.last.head.highValues == p.highValues)
            acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
      }
    val chunks = Vector.newBuilder[PartitionChunk]
    var cur = Vector.empty[SourcePartition]
    var curBytes = 0L
    for (g <- groups) {
      val gBytes = g.map(_.bytes).sum
      val wouldOverflow =
        cur.nonEmpty &&
          (curBytes + gBytes > maxBytes || cur.length + g.length > maxCount)
      if (wouldOverflow) {
        chunks += PartitionChunk(cur)
        cur = Vector.empty; curBytes = 0L
      }
      cur ++= g; curBytes += gBytes
    }
    if (cur.nonEmpty) chunks += PartitionChunk(cur)
    chunks.result()
  }
}

/** FULL vs INCREMENTAL offload-type state machine
  * (`offload_source_data.py:291-373`, `goe.py:458-491`): FULL ("100/0")
  * re-offloads everything; INCREMENTAL ("90/10") appends beyond the HWM.
  * Transitions INCREMENTAL→FULL are allowed (widen); FULL→INCREMENTAL
  * requires an explicit reset because it would orphan already-offloaded data.
  */
sealed trait OffloadType
object OffloadType {
  case object Full extends OffloadType        // "100/0"
  case object Incremental extends OffloadType // "90/10"

  def transition(from: Option[OffloadType], to: OffloadType,
                 forceReset: Boolean = false): Either[String, OffloadType] =
    (from, to) match {
      case (None, t) => Right(t)
      case (Some(Full), Incremental) if !forceReset =>
        Left("FULL->INCREMENTAL requires reset (would orphan offloaded data)")
      case (Some(_), t) => Right(t)
    }
}

/** Cumulative chunk planning over an ordered partition catalog, computed
  * WITHOUT an unpartitioned window (which would serialize the whole catalog
  * through one task — fine at 83 partitions, not at 100k).
  *
  * Shape: running sums are taken per `groupOf(key)` (a fixed-length key
  * prefix by default — monotone in key order, so group order == key order),
  * in parallel across groups; the per-group running offset is a window over
  * the group-totals AGGREGATE (group-count rows, metadata scale) broadcast
  * back. Result is identical to `SUM(n) OVER (ORDER BY key)` on any engine
  * and layout. Mirrors the reference's chunking of the partition catalog
  * (`offload_source_data.py:374-709`) which pages through partitions
  * without ever sorting them in one place.
  */
object CumulativeChunks {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.functions._

  /** @param parts one row per source partition: (keyCol, nCol)
    * @param groupOf MUST be monotone non-decreasing in `keyCol` order
    *                (a fixed-length prefix is, for equal-length keys). */
  def plan(parts: DataFrame, keyCol: String, nCol: String,
           maxRowsPerChunk: Long,
           groupOf: Column => Column = substring(_, 1, 4)): DataFrame = {
    require(maxRowsPerChunk > 0)
    val grouped = parts.withColumn("part_group", groupOf(col(keyCol)))
    val wIn = Window.partitionBy(col("part_group")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOff = Window.orderBy(col("part_group"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = grouped.groupBy(col("part_group"))
      .agg(sum(col(nCol)).as("group_n"))
      .withColumn("group_offset",
        sum(col("group_n")).over(wOff) - col("group_n"))
      .select(col("part_group"), col("group_offset"))
    grouped
      .withColumn("cum_in_group", sum(col(nCol)).over(wIn))
      .join(broadcast(offsets), "part_group")
      .withColumn("cum_rows",
        (col("group_offset") + col("cum_in_group")).cast("long"))
      .withColumn("chunk",
        floor((col("cum_rows") - 1) / maxRowsPerChunk).cast("long"))
      .drop("part_group", "cum_in_group", "group_offset")
  }
}
