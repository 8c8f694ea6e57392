package graft.component

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Configuration model of the transformation component.
  *
  * Mirrors the reference's pydantic model (`src/configuration.py:14-49`) and
  * storage mappings (`src/component.py:143-158`): SQL scripts organized as
  * blocks → codes → script strings, plus input/output table mappings.
  */
final case class Code(name: String, script: List[String])
final case class Block(name: String, codes: List[Code])

final case class InputTable(
    source: String,          // storage table id, e.g. "in.c-x.days"
    destination: String,     // SQL-visible name, e.g. "days.csv"
    fileType: String = "csv" // "csv" | "parquet"
)

final case class OutputTable(
    source: String,           // SQL-visible table name to export
    destination: String,      // storage table id
    primaryKey: List[String] = Nil,
    incremental: Boolean = false
)

final case class NamedScript(
    blockIdx: Int,    // positional block identity (names may repeat)
    block: String,    // block display name
    code: String,     // code display name
    name: String,     // query name ({code} or {code}_{i})
    sql: String
)

final case class OutputFile(
    source: String,           // file name under out/files to ship
    tags: List[String] = Nil,
    isPermanent: Boolean = false
)

final case class Config(
    blocks: List[Block],
    inputTables: List[InputTable],
    outputTables: List[OutputTable],
    outputFiles: List[OutputFile] = Nil,
    threads: Option[Int] = None,
    maxMemoryMb: Option[Long] = None,
    duckdbVersion: Option[String] = None,
    dtypesInfer: Boolean = false,
    debug: Boolean = false,
    syntaxCheckOnStartup: Boolean = false,
    action: Option[String] = None
) {
  /** Flatten to named queries: `{code}` for single-script codes,
    * `{code}_{i}` (ZERO-based) for multi-script (reference
    * `src/sql_parser.py:146-160`: `f"{code.name}_{script_index}"`).
    * Blocks are identified POSITIONALLY (index) — two config blocks may
    * legally share a display name and must still run as separate blocks. */
  def namedScripts: List[NamedScript] =
    for {
      (b, bi) <- blocks.zipWithIndex
      c <- b.codes
      (sql, i) <- c.script.zipWithIndex
      name = if (c.script.sizeIs > 1) s"${c.name}_$i" else c.name
    } yield NamedScript(bi, b.name, c.name, name, sql)
}

object Config {
  private implicit val formats: Formats = DefaultFormats

  /** Parse the component `config.json` (parameters + storage sections). */
  def parse(json: String): Config = {
    val root = JsonMethods.parse(json)
    val params = root \ "parameters"

    def str(v: JValue, d: String = ""): String =
      v match { case JString(s) => s; case _ => d }
    def bool(v: JValue, d: Boolean): Boolean =
      v match { case JBool(b) => b; case _ => d }

    val blocks = (params \ "blocks") match {
      case JArray(bs) => bs.map { b =>
        Block(str(b \ "name"),
          (b \ "codes") match {
            case JArray(cs) => cs.map { c =>
              Code(str(c \ "name"), (c \ "script") match {
                case JArray(ss) => ss.collect { case JString(s) => s }
                case JString(s) => List(s)
                case _ => Nil
              })
            }
            case _ => Nil
          })
      }
      case _ => Nil
    }

    val inTables = (root \ "storage" \ "input" \ "tables") match {
      case JArray(ts) => ts.map { t =>
        val src = str(t \ "source")
        InputTable(
          source = src,
          destination = Option(str(t \ "destination")).filter(_.nonEmpty)
            .getOrElse(src.split('.').last),
          fileType = Option(str(t \ "file_type")).filter(_.nonEmpty).getOrElse("csv"))
      }
      case _ => Nil
    }

    val outTables = (root \ "storage" \ "output" \ "tables") match {
      case JArray(ts) => ts.map { t =>
        OutputTable(
          source = str(t \ "source"),
          destination = str(t \ "destination"),
          primaryKey = (t \ "primary_key") match {
            case JArray(ks) => ks.collect { case JString(s) => s }
            case _ => Nil
          },
          incremental = bool(t \ "incremental", d = false))
      }
      case _ => Nil
    }

    val outFiles = (root \ "storage" \ "output" \ "files") match {
      case JArray(fs) => fs.map { f =>
        OutputFile(
          source = str(f \ "source"),
          tags = (f \ "tags") match {
            case JArray(ts) => ts.collect { case JString(s) => s }
            case _ => Nil
          },
          isPermanent = bool(f \ "is_permanent", d = false))
      }
      case _ => Nil
    }

    Config(
      blocks = blocks,
      inputTables = inTables,
      outputTables = outTables,
      outputFiles = outFiles,
      threads = (params \ "threads") match {
        case JInt(n) => Some(n.toInt); case _ => None
      },
      maxMemoryMb = (params \ "max_memory_mb") match {
        case JInt(n) => Some(n.toLong); case _ => None
      },
      duckdbVersion = (params \ "duckdb_version") match {
        case JString(v) if v.nonEmpty => Some(v); case _ => None
      },
      dtypesInfer = bool(params \ "dtypes_infer", d = false),
      debug = bool(params \ "debug", d = false),
      syntaxCheckOnStartup = bool(params \ "syntax_check_on_startup", d = false),
      action = (root \ "action") match {
        case JString(s) if s.nonEmpty && s != "run" => Some(s); case _ => None
      })
  }
}
