package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructField

/** Schema evolution ("schema_sync"): detect columns added at the source and
  * evolve the backend — reference `src/goe/schema_sync/` (analyzer +
  * ALTER TABLE steps). With parquet/Delta targets the evolution itself is
  * `mergeSchema`; the value here is the DETECTION + the rendered ALTER for
  * engines that need explicit DDL. */
object SchemaSync {

  final case class SyncPlan(
      addedColumns: Seq[StructField],
      removedColumns: Seq[StructField],
      alterStatements: Seq[String])

  /** Compare source schema against target schema; columns present at the
    * source but not the target get ALTER TABLE ADD COLUMN steps (removal is
    * reported but never auto-applied — same safety rule as the reference). */
  def analyze(source: DataFrame, target: DataFrame, targetName: String)
      : SyncPlan = {
    val srcFields = source.schema.fields.toSeq
    val tgtNames = target.schema.fieldNames.map(_.toLowerCase).toSet
    val srcNames = source.schema.fieldNames.map(_.toLowerCase).toSet
    val added = srcFields.filterNot(f => tgtNames.contains(f.name.toLowerCase))
    val removed = target.schema.fields.toSeq
      .filterNot(f => srcNames.contains(f.name.toLowerCase))
    val alters = added.map(f =>
      s"ALTER TABLE $targetName ADD COLUMN ${f.name} ${f.dataType.sql};")
    SyncPlan(added, removed, alters)
  }

  /** Apply evolution on a parquet path target: union the new slice with
    * schema merge (missing columns become null on old rows). */
  def evolvedRead(spark: org.apache.spark.sql.SparkSession, path: String)
      : DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
