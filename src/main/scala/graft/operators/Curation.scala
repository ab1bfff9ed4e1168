package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — what a user actually runs
  * over a raw corpus, end to end:
  *
  *   1. per-document verdicts ([[TextAnalysis.curate]]): quality floor,
  *      repetition ceiling, exact-dup canonicalisation (first-failure
  *      reason per drop);
  *   2. near-dup collapse over the survivors: MinHash signatures → LSH
  *      banding → connected components → survivorship
  *      ([[Dedup.canonicalize]], best quality wins the cluster);
  *   3. deterministic train/val/test split ([[DatasetOps.hashSplit]]).
  *
  * Each stage is the already-oracle-checked operator (q61, q28, q65, q67,
  * q62) — this object only sequences them and accounts the drops, so the
  * pipeline's scale shape is exactly its stages': one shuffle per
  * aggregation/join, map-only verdicts, no driver-side data paths. The
  * stage counts come from ONE metadata-scale aggregate per stage.
  */
object Curation {

  final case class Summary(
      total: Long,
      droppedLowQuality: Long,
      droppedRepetitive: Long,
      droppedExactDup: Long,
      droppedNearDup: Long,
      kept: Long,
      splits: Map[String, Long]) {
    def toJson: String = {
      val sp = splits.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      s"""{"total": $total, "dropped_low_quality": $droppedLowQuality, """ +
        s""""dropped_repetitive": $droppedRepetitive, """ +
        s""""dropped_exact_dup": $droppedExactDup, """ +
        s""""dropped_near_dup": $droppedNearDup, """ +
        s""""kept": $kept, "splits": $sp}"""
    }
  }

  /** Run the pipeline. Returns the kept corpus (original columns +
    * `quality` + `split`) and the per-stage accounting. */
  def run(docs: DataFrame,
          minQuality: Double = 0.3,
          maxDupFrac: Double = 0.5,
          numHashes: Int = 16,
          bands: Int = 4,
          fractions: Seq[(String, Double)] =
            Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
          idCol: String = "doc_id"): (DataFrame, Summary) = {
    // stage 1: verdicts (computed once, consumed by count + join)
    val verdicts = TextAnalysis.curate(docs, minQuality, maxDupFrac,
        idCol = idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byReason = verdicts.groupBy(col("drop_reason")).count().collect()
      .map(r => Option(r.getString(0)).getOrElse("kept") -> r.getLong(1))
      .toMap.withDefaultValue(0L)
    val total = byReason.values.sum

    // stage 2: near-dup survivorship over the verdict survivors
    val kept0 = docs.join(
      verdicts.filter(col("keep")).select(col(idCol), col("quality")),
      Seq(idCol))
    val pairs = Dedup.lshCandidates(
      Dedup.minhashSignatures(kept0, numHashes, idCol = idCol),
      numHashes, bands)
    // connectedComponents emits its id column as literal "doc_id"
    val clusters = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol)
    val canon = Dedup.canonicalize(kept0, clusters, col("quality"), idCol)
    val keptIds = canon.filter(col("is_canonical")).select(col(idCol))

    // stage 3: deterministic split over the final keep set. The result is
    // returned PERSISTED (counted once here) so the caller's write does
    // not recompute the whole pipeline; callers unpersist when done.
    val out = DatasetOps.hashSplit(
      docs.join(keptIds, Seq(idCol))
        .join(verdicts.select(col(idCol), col("quality")), Seq(idCol)),
      fractions, idCol = idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val splitCounts = out.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = splitCounts.values.sum
    verdicts.unpersist()

    (out, Summary(
      total = total,
      droppedLowQuality = byReason("low_quality"),
      droppedRepetitive = byReason("repetitive"),
      droppedExactDup = byReason("duplicate"),
      droppedNearDup = byReason("kept") - kept,
      kept = kept,
      splits = splitCounts))
  }
}
