package graft.schema

import java.time.LocalDate
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.types._

/** XBRL-type-driven column specification for FFIEC schedule TSVs
  * (ref: /root/reference/R/ffiec_types.R default_xbrl_to_readr /
  * default_ffiec_col_overrides, /root/reference/R/ffeic_read.R:377
  * make_colspec).
  *
  * A ColSpec is compiled once on the driver from (header, schema map,
  * overrides) and shipped to executors as a plain serializable value;
  * parseLine is allocation-light and runs in the member-scan task.
  */
object FfiecSchema {

  /** XBRL item type → spec code (d=double, i=int, l=boolean, c=string).
    * pureItemType is read as string and converted to proportion later,
    * exactly like the reference. */
  val defaultXbrlToSpec: Map[String, String] = Map(
    "xbrli:monetaryItemType"             -> "d",
    "ffieci:nonNegativeMonetaryItemType" -> "d",
    "xbrli:integerItemType"              -> "i",
    "xbrli:nonNegativeIntegerItemType"   -> "i",
    "xbrli:pureItemType"                 -> "c",
    "xbrli:booleanItemType"              -> "l",
    "xbrli:stringItemType"               -> "c")

  /** item name → XBRL type. The reference ships this as sysdata built
    * from FFIEC taxonomy concepts.xsd; graft accepts any such map and
    * defaults to the mnemonic-prefix heuristic used in tests. */
  val defaultSchemaMap: Map[String, String] = Map.empty

  /** Per-column overrides (ref: ffiec_types.R:28): free-text and
    * date-like columns that the schema map would mistype. */
  val defaultColOverrides: Map[String, String] = Map(
    "RCON8678" -> "c",
    "RCON9999" -> "D",
    "RIAD9106" -> "D")

  /** NA tokens for schedule cells (ref: ffeic_read.R:160). */
  val naTokens: Set[String] = Set("", "CONF")

  /** NA tokens for yyyyMMdd date cells (ref: ffeic_read.R:348). */
  val dateNaTokens: Set[String] = Set("", "0", "00000000")

  private val dateFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Compile a column spec: IDRSSD forced int, then overrides, then the
    * schema map, else string (ref: make_colspec). FFIEC rows terminate
    * with a tab, so the header carries trailing empty names — they count
    * toward the expected cell arity (the repair ladder needs that) but
    * are dropped from the output schema. */
  def colSpec(header: Seq[String],
              schemaMap: Map[String, String] = defaultSchemaMap,
              overrides: Map[String, String] = defaultColOverrides,
              xbrlToSpec: Map[String, String] = defaultXbrlToSpec): ColSpec = {
    val kept = header.reverse.dropWhile(_.isEmpty).reverse
    val codes = kept.map {
      case "IDRSSD" => "i"
      case nm if overrides.contains(nm) => overrides(nm)
      case nm => schemaMap.get(nm).flatMap(xbrlToSpec.get).getOrElse("c")
    }
    ColSpec(kept.toIndexedSeq, codes.toIndexedSeq, expectedCells = header.size)
  }
}

/** Compiled parse plan for one schedule member: column names + one-char
  * type codes (d/i/l/c/D). */
case class ColSpec(names: IndexedSeq[String], codes: IndexedSeq[String],
                   expectedCells: Int) extends Serializable {
  require(names.size == codes.size)
  require(expectedCells >= names.size)

  def arity: Int = names.size

  def sparkSchema: StructType = StructType(names.zip(codes).map {
    case (n, "d") => StructField(n, DoubleType)
    case (n, "i") => StructField(n, IntegerType)
    case (n, "l") => StructField(n, BooleanType)
    case (n, "D") => StructField(n, DateType)
    case (n, _)   => StructField(n, StringType)
  })

  // DateTimeFormatter is not Serializable — rebuild per deserialized task.
  @transient private lazy val dateFmt = DateTimeFormatter.ofPattern("yyyyMMdd")

  /** Parse one repaired TSV line into typed values (null on NA token or
    * unparseable cell — a poison cell must not kill a 100 TB job). */
  def parseLine(line: String): Seq[Any] = {
    val cells = line.split("\t", -1)
    (0 until arity).map { i =>
      val raw = if (i < cells.length) cells(i).trim else ""
      val unq = raw.replaceAll("^\"|\"$", "")
      if (FfiecSchema.naTokens.contains(unq)) null
      else codes(i) match {
        case "d" => try { unq.toDouble: java.lang.Double } catch { case _: Exception => null }
        case "i" => try { unq.toInt: java.lang.Integer } catch { case _: Exception => null }
        case "l" =>
          unq.toLowerCase match {
            case "true" | "t" | "1" | "yes" => java.lang.Boolean.TRUE
            case "false" | "f" | "0" | "no" => java.lang.Boolean.FALSE
            case _ => null
          }
        case "D" =>
          if (FfiecSchema.dateNaTokens.contains(unq)) null
          else try java.sql.Date.valueOf(LocalDate.parse(unq, dateFmt))
          catch { case _: Exception => null }
        case _ => unq
      }
    }
  }
}
