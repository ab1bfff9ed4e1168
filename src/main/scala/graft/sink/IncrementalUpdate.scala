package graft.sink

import graft.Cut.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental update: partition-scoped upsert/delete merge.
  *
  * The reference's Incremental Update capability (the IU client in the
  * planner factory, `offload_source_data.py:138-247`) handles sources whose
  * rows CHANGE, not just append. Spark-native restatement for parquet
  * targets without a transaction log: merge only the partitions that
  * contain changed keys, and rewrite exactly those via dynamic partition
  * overwrite.
  *
  * Scale shape: the affected-partition set is discovered with one
  * metadata-size aggregate over the (small) change set; the merge join
  * reads only those partitions of the target (partition pruning on the
  * IN-list); the rewrite touches only those directories. Cost is
  * O(changed partitions), never O(table). Swap-in point for Delta/Iceberg
  * MERGE where a transaction log exists — same interface.
  */
object IncrementalUpdate {

  final case class UpsertStats(
      affectedPartitions: Seq[String],
      upserted: Long,
      deleted: Long,
      finalRowsInAffected: Long,
      /** Strategy the join advisor chose for the merge's anti-joins
        * (`plain` when advising is off). */
      joinStrategy: String = "plain")

  /** Apply `changes` (new + modified rows, keyed by `keyCols`) and optional
    * `deletes` (keys to remove) to the partitioned parquet table at
    * `targetPath`. `partitionCol` must be present in both target and
    * changes. */
  def upsertPartitions(
      spark: SparkSession,
      targetPath: String,
      changes: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      deletes: Option[DataFrame] = None,
      // when set, the affected partitions' stats in the copied-stats store
      // are refreshed from the merge profile ALREADY computed below — the
      // incremental-stats path costs zero extra scans
      statsDir: Option[String] = None,
      statsTable: Option[String] = None,
      // the merge's anti-joins run under the join advisor's measured
      // recommendation (broadcast / plain / salted); disable to force
      // the plain joins (e.g. when the caller already knows the shape).
      // Thresholds are the advisor's, surfaced for tuning and tests.
      adviseJoins: Boolean = true,
      adviseBroadcastRowLimit: Long = 500000L,
      adviseSkewSharePpm: Long = 100000L): UpsertStats = {
    require(keyCols.nonEmpty)
    val deleteKeys = deletes.getOrElse(changes.limit(0).select(keyCols.map(col): _*))

    // 1. affected partitions: metadata-scale distinct over the change set
    val affected = changes.select(col(partitionCol).cast("string"))
      .union(
        deletes.map(_.join(spark.read.parquet(targetPath),
            keyCols, "inner").select(col(partitionCol).cast("string")))
          .getOrElse(changes.limit(0).select(col(partitionCol).cast("string"))))
      .distinct().collect().map(_.getString(0)).toSeq.sorted

    // 2. current content of ONLY those partitions (pruned scan)
    val target = spark.read.parquet(targetPath)
    val current = target
      .filter(col(partitionCol).cast("string").isInCollection(affected))

    // 3. merge: changes win over current; deletes drop. Tag provenance so
    //    upsert/survivor counts come from ONE materialized frame instead of
    //    re-running the joins per count. The anti-joins against the pruned
    //    target — the merge's at-scale joins — run under the JOIN ADVISOR:
    //    the probe (two keyed aggregates + a CMS bound over relations the
    //    merge reads anyway) is cheap next to an hours-long skewed join,
    //    and the recommendation is executed, not just reported. One probe
    //    serves both anti-joins: the second's left side is the first's
    //    output, a subset of `current`, so its skew can only shrink.
    val changeKeys = changes.select(keyCols.map(col): _*)
    // SHORT-CIRCUIT probe (r18, guide §1.2): the full adviseKeys probe
    // profiles per-key skew on BOTH sides and runs a two-sided CMS
    // size estimate — three extra passes over relations this merge
    // scans anyway — but skew and size only influence the decision on
    // the SORT-MERGE path. A typical incremental batch is small:
    // count the change keys first (metadata-scale), and when they fit
    // the broadcast limit the decision is already made by two counts —
    // the expensive skew/CMS probe runs only when the batch is big
    // enough that sort-merge (and its skew hazard) is on the table.
    val advice =
      if (adviseJoins) Some {
        val rRows = changeKeys.count()
        if (rRows <= adviseBroadcastRowLimit)
          graft.plan.JoinAdvisor.adviseMeasured(current.count(), rRows,
            broadcastRowLimit = adviseBroadcastRowLimit,
            skewSharePpm = adviseSkewSharePpm)
        else graft.plan.JoinAdvisor.adviseKeys(current, changeKeys,
          keyCols, adviseBroadcastRowLimit, adviseSkewSharePpm)
      }
      else None
    def antiJoin(l: org.apache.spark.sql.DataFrame,
                 r: org.apache.spark.sql.DataFrame) = advice match {
      case Some(a) =>
        graft.plan.JoinAdvisor.executeAdvised(l, r, keyCols, "left_anti",
          a, adviseSkewSharePpm)
      case None => l.join(r, keyCols, "left_anti")
    }
    val survivors = antiJoin(antiJoin(current, changeKeys),
      deleteKeys.select(keyCols.map(col): _*))
    val incoming = changes
      .join(deleteKeys.select(keyCols.map(col): _*), keyCols, "left_anti")
    val merged = survivors.withColumn("_iu_src", lit("kept"))
      .unionByName(incoming.select(current.columns.map(col): _*)
        .withColumn("_iu_src", lit("upserted")))
      // CLUSTER BY (PARTITION, bounded salt) before materializing
      // (guide §6 file sizing + §2.5): without it every one of the N
      // shuffle tasks holds rows of every affected partition, and the
      // dynamic overwrite writes N × |partitions| splinter files —
      // slower to commit, and every later read pays the listing +
      // per-file open cost. Clustering on the partition column ALONE
      // would serialize each partition into one task (a huge affected
      // partition at scale = one straggler writer), so the cluster key
      // adds a DETERMINISTIC key-hash salt (never rand() — retry
      // safety) bounded so writer slots ≈ the session's parallelism:
      // ≤ salt files per partition, parallel within partitions.
      .repartition(col(partitionCol),
        pmod(xxhash64(keyCols.map(col): _*),
          lit(math.max(1, spark.sparkContext.defaultParallelism /
            math.max(1, affected.size)))))
      // Materialize BEFORE overwriting: the plan reads targetPath, and a
      // lazy write that overwrites the path it is reading is committer- and
      // object-store-dependent (a task retry after commit would re-read
      // overwritten data). The eager cut truncates the lineage so the
      // write consumes only materialized blocks.
      .cut(true)

    // One metadata-scale aggregate off the checkpoint serves both the
    // provenance counts and the surviving-partition set.
    val profile = merged
      .groupBy(col(partitionCol).cast("string").as("p"), col("_iu_src"))
      .count().collect()
    val srcCounts = profile.groupBy(_.getString(1))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sum }
    val survivingParts = profile.map(_.getString(0)).toSet
    val out = merged.drop("_iu_src")

    // 4. rewrite exactly the affected partition directories
    val previous = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      out.write.mode("overwrite").partitionBy(partitionCol)
        .parquet(targetPath)
    } finally previous match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }

    // 5. dynamic overwrite only rewrites partitions PRESENT in `out`; an
    //    affected partition whose every row was deleted never appears there,
    //    so its stale directory must be removed explicitly.
    val emptiedParts = affected.filterNot(survivingParts)
    if (emptiedParts.nonEmpty) {
      val hadoopPath = new org.apache.hadoop.fs.Path(targetPath)
      val fs = hadoopPath.getFileSystem(
        spark.sessionState.newHadoopConf())
      // Spark escapes special chars (space, ':', '%', …) in partition dir
      // names; build the path the same way or the delete silently targets a
      // directory that does not exist and stale rows stay readable.
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      emptiedParts.foreach { v =>
        val dir = new org.apache.hadoop.fs.Path(
          hadoopPath,
          ExternalCatalogUtils.escapePathName(partitionCol) + "=" +
            ExternalCatalogUtils.escapePathName(v))
        if (!fs.delete(dir, true) && fs.exists(dir))
          throw new IllegalStateException(
            s"failed to delete emptied partition directory $dir")
      }
    }
    merged.unpersist()

    // incremental stats: upsert the affected partitions' row counts from
    // the profile (survivors per partition), drop emptied ones
    statsDir.foreach { dir =>
      val table = statsTable.getOrElse(
        new org.apache.hadoop.fs.Path(targetPath).getName)
      val perPart = profile.groupBy(_.getString(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(2)).sum }
      graft.meta.StatsStore.load(dir, table).foreach { rec =>
        val untouched = rec.partitions.filterNot(p =>
          affected.contains(p.highValue))
        val refreshed = affected.filter(perPart.contains).sorted.map { v =>
          graft.meta.PartitionStatsRec(s"p_$v", v, perPart(v),
            (perPart(v) * rec.avgRowLen).toLong)
        }
        val parts = (untouched ++ refreshed).sortBy(_.highValue)
        graft.meta.StatsStore.save(dir, rec.copy(
          numRows = parts.map(_.rows).sum,
          numBytes = parts.map(_.bytes).sum,
          partitions = parts))
      }
    }

    UpsertStats(
      affectedPartitions = affected,
      upserted = srcCounts.getOrElse("upserted", 0L),
      deleted = deleteKeys.count(),
      finalRowsInAffected = srcCounts.valuesIterator.sum,
      joinStrategy = advice.map(_.recommendation).getOrElse("plain"))
  }
}
