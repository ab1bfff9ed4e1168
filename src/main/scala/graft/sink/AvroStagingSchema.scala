package graft.sink

import graft.types.{CanonicalColumn, CanonicalType}

/** Avro staging-schema renderer — the reference's PRIMARY staging format's
  * type algebra, without the datasource.
  *
  * The reference stages extraction output as Avro whose schema routes every
  * risky type through `string` (so the transport never loses precision a
  * cast could) and keeps only provably-safe primitives native
  * (`src/goe/offload/staging/avro/avro_staging_file.py:149-310`,
  * `avro_column.py:26-36`, `staging_file.py:34-41`). This sandbox ships no
  * `spark-avro` datasource jar and no new dependencies are allowed, so the
  * EXECUTION side stays ORC (`StagedLoad`, q41); this object ports the
  * valuable part — canonical → Avro staging type matrix, the `.avsc` JSON
  * record renderer, the Avro → canonical reverse map and the Java-primitive
  * remap — as pure functions, exactly the way the Synapse/Impala DDL
  * dialects shipped without their backends.
  */
object AvroStagingSchema {

  /** Avro staging types (`avro_column.py:26-36`). */
  sealed abstract class AvroType(val name: String) {
    /** Rendering in the `.avsc` (`_get_avro_schema_json_string` lowercases). */
    def json: String = name.toLowerCase
  }
  object AvroType {
    case object AString  extends AvroType("STRING")
    case object ABytes   extends AvroType("BYTES")
    case object AInt     extends AvroType("INT")
    case object ALong    extends AvroType("LONG")
    case object AFloat   extends AvroType("FLOAT")
    case object ADouble  extends AvroType("DOUBLE")
    case object ABoolean extends AvroType("BOOLEAN")
    val all = Seq(AString, ABytes, AInt, ALong, AFloat, ADouble, ABoolean)
    def parse(s: String): AvroType = all.find(_.name.equalsIgnoreCase(s))
      .getOrElse(throw new IllegalArgumentException(
        s"Unsupported Avro data type: $s"))
  }
  import AvroType._

  /** One staged column: Avro type + whether the canonical→Avro hop was
    * provably lossless (drives try_cast at load, like `safeMapping`
    * everywhere else in the engine). */
  final case class StagingColumn(name: String, avro: AvroType,
                                 nullable: Boolean, safeMapping: Boolean)

  /** Canonical → Avro staging type
    * (`avro_staging_file.py:149-210` `_from_canonical_to_avro_column`):
    * strings/boolean native; binary native bytes (or base64 string);
    * integers/floats native ONLY when the frontend mapping was already
    * safe; everything else — unbounded integers, decimals, every temporal
    * and interval — through string, parsed again at final load. */
  def fromCanonical(col: CanonicalColumn,
                    binaryAsBase64: Boolean = false): StagingColumn = {
    def out(a: AvroType, safe: Boolean) =
      StagingColumn(col.name, a, col.nullable, safe)
    def ifSafe(a: AvroType) =
      if (col.safeMapping) out(a, safe = true) else out(AString, safe = false)
    val binaryType = if (binaryAsBase64) AString else ABytes
    col.ctype match {
      case CanonicalType.FixedString | CanonicalType.VariableString |
           CanonicalType.LargeString => out(AString, safe = true)
      case CanonicalType.Binary | CanonicalType.LargeBinary =>
        out(binaryType, safe = true)
      case CanonicalType.Integer1 | CanonicalType.Integer2 |
           CanonicalType.Integer4 => ifSafe(AInt)
      case CanonicalType.Integer8 => ifSafe(ALong)
      case CanonicalType.Integer38 => out(AString, safe = false)
      case _: CanonicalType.Decimal => out(AString, safe = false)
      case CanonicalType.Float4 => ifSafe(AFloat)
      case CanonicalType.Double8 => ifSafe(ADouble)
      case CanonicalType.Date | CanonicalType.Time |
           CanonicalType.Timestamp | CanonicalType.TimestampTz |
           CanonicalType.IntervalDs | CanonicalType.IntervalYm =>
        out(AString, safe = false)
      case CanonicalType.Boolean1 => out(ABoolean, safe = true)
    }
  }

  /** Avro → canonical (`avro_staging_file.py:212-268`
    * `_from_avro_to_canonical_column`): the read-back face — staged strings
    * come back as VARIABLE_STRING for the typed final load to re-cast. */
  def toCanonical(col: StagingColumn,
                  binaryAsBase64: Boolean = false): CanonicalColumn = {
    val ctype = col.avro match {
      case ABoolean => CanonicalType.Boolean1
      case ABytes => if (binaryAsBase64) CanonicalType.VariableString
                     else CanonicalType.Binary
      case ADouble => CanonicalType.Double8
      case AFloat => CanonicalType.Float4
      case AInt => CanonicalType.Integer4
      case ALong => CanonicalType.Integer8
      case AString => CanonicalType.VariableString
    }
    CanonicalColumn(col.name, ctype, nullable = col.nullable,
      safeMapping = col.safeMapping)
  }

  /** The `.avsc` record JSON (`avro_staging_file.py:268-291`
    * `_get_avro_schema_json_string`): nullable fields as the
    * `["type","null"]` union in the reference's member order, plus its
    * non-standard top-level `tableName` annotation. */
  def schemaJson(loadDb: String, tableName: String,
                 cols: Seq[StagingColumn]): String = {
    val fields = cols.map { c =>
      val t = if (c.nullable) s"""["${c.avro.json}","null"]"""
              else s""""${c.avro.json}""""
      s"""{"name":"${c.name}","type":$t}"""
    }.mkString(", ")
    s"""{
  "type" : "record",
  "name" : "$tableName",
  "namespace" : "$loadDb",
  "fields" : [$fields],
  "tableName" : "$loadDb.$tableName"
}"""
  }

  /** Java primitive the transport job materialises per staged column
    * (`avro_staging_file.py:293-310` + `staging_file.py:34-41`): native
    * Avro primitives map 1:1; string-staged columns read as String UNLESS
    * the canonical type is binary (base64 path) — there the reference
    * leaves the conversion implicit (None). */
  def javaPrimitive(staged: StagingColumn,
                    canonical: CanonicalColumn): Option[String] =
    staged.avro match {
      case ABoolean => Some("Boolean")
      case ADouble => Some("Double")
      case AFloat => Some("Float")
      case AInt => Some("Integer")
      case ALong => Some("Long")
      case _ if canonical.ctype != CanonicalType.Binary &&
                canonical.ctype != CanonicalType.LargeBinary => Some("String")
      case _ => None
    }

  /** Convenience: render the staging `.avsc` straight from a Spark schema
    * via the canonical layer (the only hop callers need day-to-day). */
  def fromStructType(loadDb: String, tableName: String,
                     schema: org.apache.spark.sql.types.StructType,
                     binaryAsBase64: Boolean = false): String =
    schemaJson(loadDb, tableName,
      graft.types.TypeMapper.fromStructType(schema)
        .map(fromCanonical(_, binaryAsBase64)))
}
