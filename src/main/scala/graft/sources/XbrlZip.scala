package graft.sources

import java.io.StringReader
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** XBRL fact extraction from FFIEC bulk XBRL zips
  * (ref: /root/reference/R/ffiec_process_xbrls.R:158
  * process_xbrl_inner_file).
  *
  * One task per *.xbrl.xml member; StAX streaming parse (no DOM — a
  * filing is small but there are millions, and StAX keeps per-task
  * memory flat). The contextRef is split as `schedule_IDRSSD_date`,
  * matching the reference's separate_wider_regex.
  */
object XbrlZip {

  case class Fact(IDRSSD: Option[Int], date: Option[String], schedule: Option[String],
                  item: String, unitRef: Option[String], decimals: Option[String],
                  value: String, n_attrs: Int)

  private val contextRe = """^([^_]+)_([0-9]+)_([0-9]{4}-[0-9]{2}-[0-9]{2})$""".r

  /** XMLInputFactory construction is ~ms (service discovery); one per
    * executor thread, not one per document. */
  private val factories = ThreadLocal.withInitial[XMLInputFactory] { () =>
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Pure parser for one XBRL document: all elements in the given
    * namespace prefix become facts (ref ns_prefix default "cc"). */
  def parseXbrl(xml: String, nsPrefix: String = "cc"): Seq[Fact] = {
    val reader = factories.get().createXMLStreamReader(new StringReader(xml))
    val facts = Seq.newBuilder[Fact]
    var current: Option[(String, Option[String], Option[String], Option[String], Int)] = None
    val text = new StringBuilder
    try {
      while (reader.hasNext) {
        reader.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            val prefix = Option(reader.getPrefix).getOrElse("")
            if (prefix == nsPrefix) {
              val nAttrs = reader.getAttributeCount
              var ctx: Option[String] = None
              var unit: Option[String] = None
              var dec: Option[String] = None
              (0 until nAttrs).foreach { i =>
                reader.getAttributeLocalName(i) match {
                  case "contextRef" => ctx = Some(reader.getAttributeValue(i))
                  case "unitRef"    => unit = Some(reader.getAttributeValue(i))
                  case "decimals"   => dec = Some(reader.getAttributeValue(i))
                  case _ =>
                }
              }
              current = Some((reader.getLocalName, ctx, unit, dec, nAttrs))
              text.clear()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (current.isDefined) text.append(reader.getText)
          case XMLStreamConstants.END_ELEMENT =>
            current.foreach { case (item, ctx, unit, dec, nAttrs) =>
              if (Option(reader.getPrefix).getOrElse("") == nsPrefix &&
                  reader.getLocalName == item) {
                val (sched, id, date) = ctx match {
                  case Some(contextRe(s, i, d)) => (Some(s), Some(i.toInt), Some(d))
                  case _ => (None, None, None)
                }
                facts += Fact(id, date, sched, item, unit, dec, text.toString.trim, nAttrs)
                current = None
              }
            }
          case _ =>
        }
      }
    } finally reader.close()
    facts.result()
  }

  /** Distributed extraction: facts from every *.xbrl.xml member of every
    * zip under `glob`, one task per member. */
  def facts(spark: SparkSession, glob: String, nsPrefix: String = "cc"): DataFrame = {
    import spark.implicits._
    val members = ZipTsv.listMembers(spark, glob)
      .filter(_.file.endsWith(".xbrl.xml"))
    val pairs = members.map(m => (m.zip, m.file))
    // Serialize the session's hadoop conf so runtime filesystem settings
    // (credentials, endpoints) reach the executor-side open, as in ZipTsv.
    val confMap = ZipTsv.confToMap(
      new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration))
    val ds: Dataset[Fact] = spark.createDataset(pairs)
      .repartition(math.max(1, math.min(pairs.size, 1024)))
      .flatMap { case (zip, member) =>
        val xml = readMemberFully(zip, member, confMap)
        parseXbrl(xml, nsPrefix)
      }
    ds.toDF()
  }

  private def readMemberFully(zip: String, member: String,
                              confMap: Map[String, String]): String = {
    val zin = ZipTsv.openStream(zip, confMap)
    try {
      val found = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .exists(_.getName == member)
      require(found, s"member $member not found in $zip")
      new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    } finally zin.close()
  }
}
