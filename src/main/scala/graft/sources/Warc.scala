package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record. `headers` carries every header verbatim
  * (including the WARC-* ones surfaced as typed columns). */
case class WarcRecord(file: String, record_type: String, record_id: String,
                      target_uri: String, warc_date: String,
                      headers: Map[String, String], payload: Array[Byte])

/** WARC (ISO 28500) corpus source/sink — the wire format web-crawl
  * corpora arrive in (Common Crawl and friends), complementing
  * [[Jsonl]] on the ingest side. Minimal but REAL framing: records are
  * walked by Content-Length (a payload containing "WARC/1.0" can never
  * desynchronize the parser), headers are returned verbatim, payloads
  * stay bytes until the caller decodes them.
  *
  * Scale posture: WARC files are not splittable (records are
  * length-prefixed but unindexed), so parallelism is per-file — the
  * ZipTsv posture: many medium files saturate a fleet; one giant file
  * serializes. Reading uses the binaryFile source + a per-file record
  * walk in mapPartitions (the sanctioned source-boundary use); writing
  * emits one .warc file per partition via the Hadoop FileSystem, so
  * the sink is exactly as distributed as the upstream partitioning.
  *
  * Tolerance: a file that stops framing cleanly (bad magic, malformed
  * header block, truncated payload) yields the records parsed up to
  * that point and is then skipped — scraped archives are dirty and a
  * 100 TB ingest must not die hours in on one bad shard. Files whose
  * record count is zero are the audit trail (anti-join input listing
  * vs `file` column).
  */
object Warc {

  private val Magic = "WARC/1.0"

  /** Parse every WARC record in every file under `path` (non-recursive
    * glob semantics follow the binaryFile source). `.gz`/`.warc.gz`
    * files are inflated first — including CONCATENATED gzip members,
    * Common Crawl's actual on-disk form (one member per record), which
    * the JDK's GZIPInputStream walks natively. Compressed archives
    * remain per-file work units either way (gzip isn't splittable);
    * the record walk is identical after inflation. */
  def read(spark: SparkSession, path: String): Dataset[WarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (file, bytes) =>
        parseFile(file, maybeGunzip(file, bytes))
      })
  }

  /** Inflate `.gz` payloads (multi-member streams included); a file
    * that fails to inflate yields no bytes — the same skip-the-shard
    * tolerance as a mid-file framing error. */
  private[sources] def maybeGunzip(file: String,
                                   bytes: Array[Byte]): Array[Byte] =
    if (!file.endsWith(".gz")) bytes
    else try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => Array.emptyByteArray }

  /** Record walk over one file's bytes. Package-visible for specs. */
  private[sources] def parseFile(file: String,
                                 bytes: Array[Byte]): Iterator[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var ok = true
    def lineAt(p: Int): Option[(String, Int)] = {
      var i = p
      while (i + 1 < bytes.length &&
             !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) None
      else Some((new String(bytes, p, i - p, "UTF-8"), i + 2))
    }
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length &&
             bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) ok = false
      else lineAt(pos) match {
        case Some((magic, next)) if magic == Magic =>
          var p = next
          var headers = Map.empty[String, String]
          var headersOk = true
          var blank = false
          while (headersOk && !blank) {
            lineAt(p) match {
              case Some(("", n)) => blank = true; p = n
              case Some((line, n)) =>
                val idx = line.indexOf(':')
                if (idx <= 0) headersOk = false
                else {
                  headers += (line.substring(0, idx).trim
                    -> line.substring(idx + 1).trim)
                  p = n
                }
              case None => headersOk = false
            }
          }
          val len = headers.get("Content-Length").flatMap(_.toIntOption)
          if (!headersOk || blank == false || len.isEmpty ||
              p + len.get > bytes.length) ok = false
          else {
            out += WarcRecord(file,
              headers.getOrElse("WARC-Type", ""),
              headers.getOrElse("WARC-Record-ID", ""),
              headers.getOrElse("WARC-Target-URI", ""),
              headers.getOrElse("WARC-Date", ""),
              headers,
              java.util.Arrays.copyOfRange(bytes, p, p + len.get))
            pos = p + len.get
          }
        case _ => ok = false // bad magic / truncated: skip rest of file
      }
    }
    out.iterator
  }

  /** Streaming twin of [[read]]: WARC shards landing in `path` are
    * parsed exactly once under the file-source contract (the
    * Jsonl.readStream posture for crawl archives) — binaryFile is a
    * regular FileFormat, so the file stream source drives the same
    * per-file record walk. `maxFilesPerTrigger` bounds per-batch work;
    * tolerance semantics match the batch read. */
  def readStream(spark: SparkSession, path: String,
                 maxFilesPerTrigger: Int = 100): Dataset[WarcRecord] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (f, b) =>
        parseFile(f, maybeGunzip(f, b))
      })
  }

  /** Write response records, one .warc file per partition. `uriCol` is
    * the WARC-Target-URI, `payloadCol` (binary) the record body, and
    * `headersCol` (optional map<string,string>) extra headers written
    * verbatim. Record IDs are deterministic (md5 of the URI) and
    * `date` is caller-supplied, so a regenerated shard is byte-stable
    * — the reproducibility posture every other sink here keeps. */
  def write(df: DataFrame, path: String, uriCol: String, payloadCol: String,
            headersCol: Option[String] = None,
            date: String = "2026-01-01T00:00:00Z"): Unit = {
    val rows = df.select(
      col(uriCol).cast("string").as("uri"),
      col(payloadCol).cast("binary").as("payload"),
      headersCol.map(col).getOrElse(
        map().cast("map<string,string>")).as("hdrs"))
    import rows.sparkSession.implicits._
    // Ship the SESSION's Hadoop conf to the tasks (Configuration is a
    // Writable — public serialization), so filesystem credentials and
    // custom schemes survive; a fresh Configuration() in the task
    // would silently drop them on any non-default FS.
    val confBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      rows.sparkSession.sparkContext.hadoopConfiguration
        .write(new java.io.DataOutputStream(baos))
      baos.toByteArray
    }
    val ds = rows.as[(String, Array[Byte], Map[String, String])]
    ds.rdd.mapPartitionsWithIndex { (part, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        conf.readFields(new java.io.DataInputStream(
          new java.io.ByteArrayInputStream(confBytes)))
        val target = new org.apache.hadoop.fs.Path(
          path, f"part-$part%05d.warc")
        val fs = target.getFileSystem(conf)
        val outStream = fs.create(target, true)
        var n = 0L
        it.foreach { case (uri, payload, hdrs) =>
          val body = if (payload == null) Array.emptyByteArray else payload
          val id = java.security.MessageDigest.getInstance("MD5")
            .digest(uri.getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          val sb = new StringBuilder
          sb.append(Magic).append("\r\n")
          sb.append("WARC-Type: response\r\n")
          sb.append(s"WARC-Record-ID: <urn:md5:$id>\r\n")
          sb.append(s"WARC-Date: $date\r\n")
          sb.append(s"WARC-Target-URI: $uri\r\n")
          hdrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
            sb.append(s"$k: $v\r\n")
          }
          sb.append(s"Content-Length: ${body.length}\r\n\r\n")
          outStream.write(sb.toString.getBytes("UTF-8"))
          outStream.write(body)
          outStream.write("\r\n\r\n".getBytes("UTF-8"))
          n += 1
        }
        outStream.close()
        Iterator.single(n)
      }
    }.count(): Unit
  }
}
