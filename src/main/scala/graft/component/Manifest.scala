package graft.component

import java.nio.file.{Files, Path}

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Keboola-manifest I/O and the base-type ⇔ Spark-type mapping.
  *
  * Input manifests (reference `src/in_tables_creator.py:70-78`) carry the
  * CSV dialect and optional per-column base types; output manifests
  * (reference `src/component.py:166-179`) carry destination + result schema
  * down-mapped to base types (`convert_base_types`,
  * `src/component.py:196-224`).
  */
final case class ColumnType(name: String, baseType: Option[String])

final case class InManifest(
    columns: List[String],           // declared column names ([] = CSV has header)
    columnTypes: Map[String, String],// name → base type, when declared
    delimiter: String = ",",
    enclosure: String = "\"",
    id: Option[String] = None)       // storage table id ("id" or "source" key)

object Manifest {
  private implicit val formats: Formats = DefaultFormats

  /** Keboola base types (SURVEY §1): the manifest-boundary type system. */
  val BaseTypes: Set[String] =
    Set("STRING", "INTEGER", "NUMERIC", "FLOAT", "BOOLEAN", "DATE", "TIMESTAMP")

  def baseToSpark(base: String): DataType = base.toUpperCase match {
    case "INTEGER"   => LongType
    case "NUMERIC"   => DecimalType(38, 18)
    case "FLOAT"     => DoubleType
    case "BOOLEAN"   => BooleanType
    case "DATE"      => DateType
    case "TIMESTAMP" => TimestampType
    case _           => StringType
  }

  /** Engine type → base type for the output manifest (A8). Everything
    * nested/exotic collapses to STRING, like the reference's fallback. */
  def sparkToBase(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case _: DecimalType                                => "NUMERIC"
    case FloatType | DoubleType                        => "FLOAT"
    case BooleanType                                   => "BOOLEAN"
    case DateType                                      => "DATE"
    case TimestampType | TimestampNTZType              => "TIMESTAMP"
    case _                                             => "STRING"
  }

  /** Read `<table>.manifest` next to the data file/dir; absent manifest ⇒
    * header CSV with full inference (the reference's no-manifest path). */
  def readInput(manifestPath: Path): InManifest = {
    if (!Files.exists(manifestPath)) return InManifest(Nil, Map.empty)
    val root = JsonMethods.parse(Files.readString(manifestPath))

    val columns = (root \ "columns") match {
      case JArray(cs) => cs.collect { case JString(s) => s }
      case _ => Nil
    }
    // two manifest generations: legacy column_metadata KBC.datatype.basetype
    // entries, and the newer schema[{name, data_type.base.type}] list.
    val fromMeta = (root \ "column_metadata") match {
      case JObject(fields) => fields.flatMap { case (col, meta) =>
        meta match {
          case JArray(entries) => entries.collectFirst {
            case e if (e \ "key") == JString("KBC.datatype.basetype") =>
              col -> ((e \ "value") match { case JString(v) => v; case _ => "STRING" })
          }
          case _ => None
        }
      }.toMap
      case _ => Map.empty[String, String]
    }
    val fromSchema = (root \ "schema") match {
      case JArray(cols) => cols.flatMap { c =>
        (c \ "name", c \ "data_type" \ "base" \ "type") match {
          case (JString(n), JString(t)) => Some(n -> t)
          case _ => None
        }
      }.toMap
      case _ => Map.empty[String, String]
    }
    val schemaCols = (root \ "schema") match {
      case JArray(cols) => cols.collect { case c if (c \ "name").isInstanceOf[JString] =>
        (c \ "name").asInstanceOf[JString].s }
      case _ => Nil
    }

    InManifest(
      columns = if (columns.nonEmpty) columns else schemaCols,
      columnTypes = fromMeta ++ fromSchema,
      delimiter = (root \ "delimiter") match { case JString(s) if s.nonEmpty => s; case _ => "," },
      enclosure = (root \ "enclosure") match { case JString(s) if s.nonEmpty => s; case _ => "\"" },
      // storage id: legacy manifests say "id", newer ones "source"
      // (both generations appear in the reference's own fixtures)
      id = ((root \ "id"), (root \ "source")) match {
        case (JString(s), _) if s.nonEmpty => Some(s)
        case (_, JString(s)) if s.nonEmpty => Some(s)
        case _ => None
      })
  }

  /** Declared-else-inferred schema (A5): None ⇒ let the reader infer. */
  def declaredSchema(m: InManifest, dtypesInfer: Boolean): Option[StructType] =
    if (dtypesInfer || m.columns.isEmpty) None
    else Some(StructType(m.columns.map(c =>
      StructField(c, baseToSpark(m.columnTypes.getOrElse(c, "STRING"))))))

  /** Write the output-table manifest, byte-identical to the reference's
    * (`tests/functional/<case>/expected/data/out/tables/<t>.manifest`): one line,
    * `json.dumps` separators (`", "` / `": "`), fixed key order,
    * `primary_key` present only when non-empty, every column
    * `"nullable": true` (the reference builds each ColumnDefinition from
    * DESCRIBE output without nullability, `src/component.py:162-173`), and
    * no trailing newline. */
  def writeOutput(path: Path, out: OutputTable, schema: StructType): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val cols = schema.fields.map { f =>
      s"""{"name": ${q(f.name)}, "data_type": {"base": {"type": ${q(sparkToBase(f.dataType))}}}, "nullable": true}"""
    }.mkString("[", ", ", "]")
    val pk =
      if (out.primaryKey.isEmpty) ""
      else s""", "primary_key": ${out.primaryKey.map(q).mkString("[", ", ", "]")}"""
    val json =
      s"""{"destination": ${q(out.destination)}, "incremental": ${out.incremental}$pk, "write_always": false, "delimiter": ",", "enclosure": "\\"", "manifest_type": "out", "has_header": true, "schema": $cols}"""
    Files.createDirectories(path.getParent)
    Files.writeString(path, json)
  }
}
