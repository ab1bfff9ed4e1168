package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe high-water-mark sidecar files for the streaming stores.
  *
  * A bare `fs.create(path, overwrite = true)` TRUNCATES the old value
  * before the new bytes land, so a crash between the two leaves an
  * empty file — and a reader that throws on it wedges the stream on
  * every restart. Writes here go through a temp file + rename (the
  * [[graft.meta.MetadataStore]] discipline), and reads tolerate a
  * missing, empty, or torn file by returning -1: for the stores using
  * these sidecars, replays are idempotent by construction (batch-scoped
  * dynamic overwrite), so a lost HWM only costs a redundant-but-harmless
  * rewrite — never a double-count and never a wedge.
  */
private[streaming] object Hwm {

  def read(fs: FileSystem, path: Path): Long = {
    if (!fs.exists(path)) return -1L
    val in = fs.open(path)
    val raw = try new String(in.readAllBytes(), "UTF-8").trim
      finally in.close()
    try if (raw.isEmpty) -1L else raw.toLong
    catch { case _: NumberFormatException => -1L }
  }

  /** Discriminate a benign foreachBatch replay from a checkpoint reset.
    *
    * Offsets commit per batch, so a legitimate replay can only re-fire
    * the LAST committed batch — `batchId == committed` is the ONLY
    * benign skip (returns false: caller no-ops). `batchId` BELOW the
    * committed HWM means the checkpoint was reset (ids restarted at 0)
    * or the store is bound to the wrong stream; silently skipping would
    * turn EVERY future batch into a no-op and drop new data without a
    * signal (ids climb from 0 toward the old HWM), so fail loudly and
    * make the operator reset the store or restore the checkpoint — the
    * [[graft.streaming.StreamingOffload]] discipline, shared by every
    * HWM-guarded store. Returns true when the batch is new work. */
  def replayGuard(batchId: Long, committed: Long,
                  store: String): Boolean = {
    if (batchId > committed) return true
    if (batchId == committed) return false
    throw new IllegalStateException(
      s"$store: batch id $batchId is below the committed HWM " +
        s"$committed — the checkpoint was reset (batch ids restart " +
        "at 0) or this store belongs to another stream. Refusing to " +
        "skip (that would silently drop every new batch until ids " +
        "pass the old HWM); reset the store or restore the checkpoint.")
  }

  def write(fs: FileSystem, path: Path, value: Long): Unit = {
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(value.toString.getBytes("UTF-8"))
    finally out.close()
    fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(s"hwm write: cannot install $tmp")
  }
}

/** Swap-managed relation directory: temp write + two renames install a
  * new generation atomically, with crash recovery and swap-tolerant
  * reads. The contract, spec-pinned on the rank store and shared by the
  * community store:
  *   - WRITERS heal: [[recover]] runs before an install (a crash between
  *     the two renames leaves the aside but no current — rename it back).
  *   - READERS never heal: [[resolveForRead]] serves the aside when the
  *     current dir is missing (a reader landing inside a LIVE writer's
  *     rename window must not rename the aside back mid-install).
  *   - The aside is RETAINED through the swap and reclaimed at the start
  *     of the NEXT install: deleting it at swap end would fail a
  *     concurrent reader still scanning the previous generation. */
private[streaming] object SwapDir {

  def current(storeDir: String, name: String): Path =
    new Path(storeDir, name)
  def aside(storeDir: String, name: String): Path =
    new Path(storeDir, name + "__old")

  /** Writer-side crash recovery: current missing + aside present. */
  def recover(fs: FileSystem, storeDir: String, name: String): Unit = {
    val cur = current(storeDir, name)
    val old = aside(storeDir, name)
    if (!fs.exists(cur) && fs.exists(old) && !fs.rename(old, cur))
      throw new IllegalStateException(s"$name swap recovery failed: $old")
  }

  /** Read-side resolution — current, else the aside, else nothing; no
    * filesystem mutation ever. */
  def resolveForRead(fs: FileSystem, storeDir: String,
                     name: String): Option[Path] = {
    val cur = current(storeDir, name)
    if (fs.exists(cur)) Some(cur)
    else {
      val old = aside(storeDir, name)
      if (fs.exists(old)) Some(old) else None
    }
  }

  /** Write `df` as the new generation of `storeDir/name`. The previous
    * generation moves to the aside and STAYS there (deferred reclaim —
    * see the object doc). */
  def install(spark: org.apache.spark.sql.SparkSession,
              df: org.apache.spark.sql.DataFrame,
              storeDir: String, name: String): Unit = {
    val cur = current(storeDir, name)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(storeDir, name + "__tmp")
    fs.delete(tmp, true)
    df.write.parquet(tmp.toString)
    val old = aside(storeDir, name)
    fs.delete(old, true)
    if (fs.exists(cur) && !fs.rename(cur, old))
      throw new IllegalStateException(s"$name install: cannot move aside")
    if (!fs.rename(tmp, cur)) {
      if (fs.exists(old)) fs.rename(old, cur)
      throw new IllegalStateException(s"$name install: cannot install")
    }
    ()
  }
}

/** Shared guard for the maintenance folds ([[StreamingDedup.compactIndex]],
  * [[StreamingIvf.compactIndex]], [[StreamingTextIndex.compact]]): only
  * COMMITTED batches may fold into `batch_id=-1`, i.e. `batch_id <= HWM`
  * (negative migrated/folded ids sort below every HWM and are committed
  * by construction). An UNCOMMITTED partition — id above the HWM, its
  * batch crashed between the data write and the HWM write — must stay
  * its own partition: the stream's replay will dynamic-overwrite it, and
  * folding it into `-1` first would double its rows the moment the
  * replay lands. The preserved dirs ride into the rewritten temp as pure
  * metadata renames before the swap, so the installed directory carries
  * them unchanged. (A crash between those renames and the swap can drop
  * an uncommitted partition from the live root — harmless: its batch is
  * by definition not in the stream's commit log and replays in full.) */
private[streaming] object CommittedFold {

  def batchIdOf(name: String): Option[Long] =
    if (!name.startsWith("batch_id=")) None
    else scala.util.Try(name.stripPrefix("batch_id=").toLong).toOption

  /** `batch_id=N` partition dirs under `root` with N above the HWM. */
  def uncommittedDirs(fs: FileSystem, root: Path,
                      hwm: Long): Array[Path] =
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(st => batchIdOf(st.getPath.getName).exists(_ > hwm))
      .map(_.getPath)

  /** Metadata-rename each preserved partition dir into the rewritten
    * temp, so the swap installs committed-fold + uncommitted-as-is. */
  def preserveInto(fs: FileSystem, dirs: Array[Path], tmp: Path): Unit =
    dirs.foreach { d =>
      if (!fs.rename(d, new Path(tmp, d.getName)))
        throw new IllegalStateException(
          s"compact: cannot preserve uncommitted partition $d")
    }
}

/** One-time in-place upgrade of a pre-`batch_id` store layout.
  *
  * The exactly-once rewrite partitions every store by `batch_id`; a
  * store written by the append-only layout has its leaves one level
  * shallower (`bucket=K/part-*.parquet`, or bare part files), and Spark
  * partition discovery over the MIXED tree throws "Conflicting
  * directory structures" — the store would wedge, not degrade. Folding
  * the legacy entries under `batch_id=-1` (pure metadata renames, one
  * level) makes old data a normal committed partition: probed, pruned,
  * and compacted exactly like a folded batch. */
private[streaming] object LegacyLayout {

  // per-JVM memo of paths already checked: the migration is one-time, so
  // steady-state batches skip the listStatus probes entirely (on object
  // stores those are billable LIST calls on every micro-batch)
  private val migrated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def legacyEntries(fs: FileSystem, root: Path) =
    if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
    else fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      !n.startsWith("batch_id=") && !n.startsWith("_") &&
        !n.startsWith(".")
    }

  /** Rename-fold, for stores whose legacy files do NOT carry a
    * `batch_id` data column (the dedup band index, the curation hash
    * index, the IVF cell store): legacy entries move under
    * `batch_id=-1` as pure metadata renames. */
  def fold(fs: FileSystem, root: Path): Unit = {
    if (migrated.contains(root.toString)) return
    val entries = legacyEntries(fs, root)
    if (entries.isEmpty) { migrated.add(root.toString); (); return }
    val dest = new Path(root, "batch_id=-1")
    fs.mkdirs(dest)
    entries.foreach { st =>
      if (!fs.rename(st.getPath, new Path(dest, st.getPath.getName)))
        throw new IllegalStateException(
          s"legacy layout fold: cannot move ${st.getPath}")
    }
    migrated.add(root.toString); ()
  }

  /** Rewrite-fold, for stores whose legacy files DO carry `batch_id` as
    * a DATA column (the dedup pairs table, the curation corpus and
    * quarantine): a rename under `batch_id=-1` would collide the data
    * column with the partition column and fail every read. Instead the
    * loose legacy files rewrite ONCE into `batch_id` partitions derived
    * from their own column — a pair/doc-scale job, run only on first
    * contact with an old store. Crash-safe: the rewrite lands in a temp
    * dir first; the loose files are deleted only after it completes; a
    * leftover temp with no loose files resumes the move.
    *
    * Legacy ids are REMAPPED into the reserved negative range
    * `id -> -(id + 2)` (keeping `-1` for compaction folds). Preserving
    * them verbatim would be a data-loss trap: a stream restarted with a
    * FRESH checkpoint over an upgraded store restarts batch ids at 0,
    * and its dynamic partition overwrite of `batch_id=0..K` would
    * silently replace the migrated partitions carrying the same ids.
    * Negative ids can never collide with a live foreachBatch id (always
    * >= 0), and sort below every HWM, so compaction folds treat migrated
    * data as committed — which it is. */
  def rewriteFold(spark: org.apache.spark.sql.SparkSession,
                  root: Path): Unit = {
    if (migrated.contains(root.toString)) return
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root.getParent, root.getName + "__legacy_tmp")
    def moveIn(): Unit = {
      fs.listStatus(tmp).filter(_.getPath.getName.startsWith("batch_id="))
        .foreach { st =>
          val dest = new Path(root, st.getPath.getName)
          fs.delete(dest, true)
          if (!fs.rename(st.getPath, dest))
            throw new IllegalStateException(
              s"legacy rewrite: cannot move ${st.getPath}")
        }
      fs.delete(tmp, true)
      ()
    }
    // Spark's committer writes _SUCCESS when the rewrite COMPLETED — the
    // authoritative resume signal. A completed tmp must never be thrown
    // away while loose files remain: the interrupted step was the
    // deletion loop, and the tmp holds the ONLY copy of the rows whose
    // loose files are already gone. An incomplete tmp (no _SUCCESS) is
    // discardable garbage precisely because no loose file was deleted
    // before the write finished.
    val tmpComplete = fs.exists(new Path(tmp, "_SUCCESS"))
    val loose = legacyEntries(fs, root).filter(_.isFile)
    if (tmpComplete) {
      loose.foreach(st => fs.delete(st.getPath, false))
      moveIn()
      migrated.add(root.toString); ()
      return
    }
    if (loose.isEmpty) {
      fs.delete(tmp, true) // incomplete leftover, nothing to fold
      migrated.add(root.toString); ()
      return
    }
    fs.delete(tmp, true)
    spark.read.parquet(loose.map(_.getPath.toString): _*)
      .withColumn("batch_id",
        org.apache.spark.sql.functions.expr("-(CAST(batch_id AS BIGINT) + 2)"))
      .write.partitionBy("batch_id").parquet(tmp.toString)
    loose.foreach(st => fs.delete(st.getPath, false))
    moveIn()
    migrated.add(root.toString); ()
  }
}
