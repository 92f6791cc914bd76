package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 Web ARChive) source/sink — the container format of
  * web-crawl corpora (Common Crawl ships WARC/WET; every web-scale LLM
  * pretraining pipeline starts by parsing it). No reference analogue
  * (the reference ingests a curated CSV feed); this is the ingestion
  * format that precedes such feeds.
  *
  * Format notes (public spec, ISO 28500 / WARC 1.1):
  *  - a record is a CRLF-terminated header block (`WARC/1.1`,
  *    `WARC-Type`, `WARC-Record-ID`, `Content-Length`, ...), one empty
  *    line, `Content-Length` payload bytes, then TWO empty lines;
  *  - `response` record payloads are full HTTP responses (status line +
  *    headers + body), which [[read]] splits off into `http_status` /
  *    `body`;
  *  - the crawl convention ([[writeGzip]]) gzips EACH RECORD as its own
  *    gzip member and concatenates the members, so a reader can stream
  *    records without decompressing the whole file and a range request
  *    can start at any member boundary. `GZIPInputStream` consumes
  *    multi-member streams natively.
  *
  * Scale shape: WARC is processed FILE-AT-A-TIME by every engine that
  * reads it — member-gzip is not block-splittable, and crawl writers
  * bound files (~1 GB) for exactly this reason. The read is
  * `binaryFile` → `flatMap(parse)`: parallelism = number of archive
  * files, which at 100 TB is ~100k files — far beyond any cluster's
  * core count, so the shape saturates. Files beyond 2 GB would need a
  * streaming split (Spark's `binaryFile` holds one file in one row);
  * bounded crawl files make that moot, and [[write]] bounds its own
  * output the same way.
  *
  * Malformed-input posture (the [[Jsonl]] contract — route, don't
  * drop, never throw): a structurally broken record STOPS the parse of
  * that file and the remaining bytes come back as ONE row with
  * `warc_type = "corrupt"` and the remaining bytes as the payload, so a damaged
  * archive surfaces in an audit count instead of killing the job or
  * silently truncating.
  */
object Warc {

  /** Schema of [[read]]: one row per WARC record. */
  val schema: StructType = StructType(Seq(
    StructField("path", StringType),          // source archive file
    StructField("warc_type", StringType),     // warcinfo|response|corrupt|...
    StructField("record_id", StringType),
    StructField("target_uri", StringType),
    StructField("content_type", StringType),  // of the WARC payload
    StructField("content_length", LongType),
    StructField("http_status", IntegerType),  // null unless HTTP payload
    StructField("body", BinaryType)))         // HTTP body, or raw payload

  private val CRLF = "\r\n".getBytes(UTF_8)

  /** One serialized WARC record (header block + payload + separator). */
  private def recordBytes(warcType: String, recordId: String,
                          targetUri: Option[String], date: String,
                          contentType: String,
                          payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.1\r\n"
    h ++= s"WARC-Type: $warcType\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$recordId>\r\n"
    h ++= s"WARC-Date: $date\r\n"
    targetUri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n"
    h ++= "\r\n"
    val bos = new ByteArrayOutputStream(h.length + payload.length + 4)
    bos.write(h.toString.getBytes(UTF_8))
    bos.write(payload)
    bos.write(CRLF); bos.write(CRLF)
    bos.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Write `df` as WARC `response` records under `dir`, one archive per
    * input partition (`part-NNNNN.warc[.gz]`) — repartition upstream to
    * choose the archive count/size. Expected columns: `uri` (string),
    * `content_type` (string), `payload` (binary). Each payload is
    * wrapped as an `HTTP/1.1 200 OK` response (the crawl shape).
    *
    * Determinism: record ids are md5(uri) (id-pure — reruns and task
    * retries produce identical records) and `date` is caller-fixed, so
    * archives are byte-reproducible per (partitioning, row order).
    *
    * Task-commit protocol: each task writes to an `.inprogress` temp path
    * (invisible to [[read]]'s `*.warc*` glob) and atomically renames on
    * success — a speculative/retried attempt racing a still-running one
    * can never interleave bytes into the same archive, the first rename
    * wins and the loser deletes its temp, and a failed task leaves no
    * truncated `part-NNNNN` behind for a later read to treat as data.
    */
  def write(df: DataFrame, dir: String, gzip: Boolean = true,
            date: String = "2026-01-01T00:00:00Z"): Unit = {
    val cols = df.select(col("uri").cast("string"),
      col("content_type").cast("string"), col("payload").cast("binary"))
    val suffix = if (gzip) ".warc.gz" else ".warc"
    // Driver-side dir prep: clear any PRE-EXISTING part files (and orphaned
    // .inprogress temps from a killed prior job) before tasks launch. The
    // task commit below refuses to rename over an existing destination —
    // that protects against a RACING attempt within this job, but on HDFS
    // (where rename-to-existing returns false, unlike RawLocalFileSystem)
    // it would also silently keep a STALE archive from an earlier write
    // into the same dir. Deleting here restores overwrite semantics while
    // keeping the first-attempt-wins guarantee within the job.
    locally {
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      val fs = dirPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(dirPath)) {
        val stale = fs.globStatus(new org.apache.hadoop.fs.Path(dir, "part-*"))
        if (stale != null) stale.foreach(s => fs.delete(s.getPath, false))
      }
    }
    cols.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val path = new org.apache.hadoop.fs.Path(
          dir, f"part-$pid%05d$suffix")
        val tmp = new org.apache.hadoop.fs.Path(
          dir, f"part-$pid%05d-${tc.taskAttemptId()}.inprogress")
        val fs = path.getFileSystem(conf)
        val out = new DataOutputStream(fs.create(tmp, true))
        var ok = false
        try {
          // leading warcinfo record (spec convention: first record names
          // the archive)
          val info = recordBytes("warcinfo",
            md5Hex(s"warcinfo:$pid"), None, date,
            "application/warc-fields",
            s"software: graft-warc\r\npartition: $pid\r\n".getBytes(UTF_8))
          out.write(if (gzip) gzipMember(info) else info)
          it.foreach { r =>
            val uri = r.getString(0)
            val ct = Option(r.getString(1)).getOrElse("application/octet-stream")
            val body = Option(r.getAs[Array[Byte]](2))
              .getOrElse(Array.emptyByteArray)
            val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
              s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8)
            val payload = new Array[Byte](http.length + body.length)
            System.arraycopy(http, 0, payload, 0, http.length)
            System.arraycopy(body, 0, payload, http.length, body.length)
            val rec = recordBytes("response", md5Hex(uri), Some(uri), date,
              "application/http;msgtype=response", payload)
            out.write(if (gzip) gzipMember(rec) else rec)
          }
          ok = true
        } finally {
          out.close()
          if (ok) {
            // commit: rename fails if a racing attempt already landed the
            // final path — keep the winner's archive, drop this one
            if (!fs.rename(tmp, path) && fs.exists(tmp))
              fs.delete(tmp, false)
          } else fs.delete(tmp, false)
        }
      }
    }
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  /** Read every WARC archive under `dir` (plain or gzipped — sniffed per
    * file by magic bytes) into [[schema]] rows. One task per archive
    * file; the scan projects nothing it does not need because the whole
    * record must be parsed anyway (WARC is not columnar — convert to
    * parquet once, early, which is what a pipeline built on this source
    * does with its first write).
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("path"), col("content"))
    val parsed = files.flatMap { r =>
      val path = r.getString(0)
      val raw = r.getAs[Array[Byte]](1)
      val bytes =
        if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F &&
            (raw(1) & 0xFF) == 0x8B) {
          val in = new GZIPInputStream(
            new java.io.ByteArrayInputStream(raw), 1 << 16)
          val bos = new ByteArrayOutputStream(raw.length * 4)
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          in.close(); bos.toByteArray
        } else raw
      parseAll(path, bytes)
    }(org.apache.spark.sql.Encoders.row(schema))
    parsed.toDF()
  }

  /** Parse a decompressed archive into records; a malformed record ends
    * the file with one `corrupt` row carrying the unparsed remainder.
    */
  private[graft] def parseAll(path: String,
                                bytes: Array[Byte]): Iterator[Row] = {
    val out = Seq.newBuilder[Row]
    var off = 0
    var broken = false
    while (!broken && off < bytes.length) {
      // skip inter-record blank lines
      while (off + 1 < bytes.length && bytes(off) == '\r' &&
             bytes(off + 1) == '\n') off += 2
      if (off >= bytes.length) ()
      else parseOne(path, bytes, off) match {
        case Some((row, next)) => out += row; off = next
        case None =>
          out += Row(path, "corrupt", null, null, null,
            (bytes.length - off).toLong, null,
            java.util.Arrays.copyOfRange(bytes, off, bytes.length))
          broken = true
      }
    }
    out.result().iterator
  }

  private def lineEnd(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < bytes.length &&
           !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
    if (i + 1 < bytes.length) i else -1
  }

  private def parseOne(path: String, bytes: Array[Byte],
                       start: Int): Option[(Row, Int)] = {
    var off = start
    val ver = lineEnd(bytes, off)
    if (ver < 0) return None
    val version = new String(bytes, off, ver - off, UTF_8)
    if (!version.startsWith("WARC/")) return None
    off = ver + 2
    var warcType: String = null; var recordId: String = null
    var targetUri: String = null; var contentType: String = null
    var contentLength = -1L
    var done = false
    while (!done) {
      val e = lineEnd(bytes, off)
      if (e < 0) return None
      if (e == off) { done = true; off += 2 } // empty line ends headers
      else {
        val line = new String(bytes, off, e - off, UTF_8)
        off = e + 2
        val ci = line.indexOf(':')
        if (ci > 0) {
          val k = line.substring(0, ci).trim.toLowerCase
          val v = line.substring(ci + 1).trim
          k match {
            case "warc-type" => warcType = v
            case "warc-record-id" =>
              recordId = v.stripPrefix("<").stripSuffix(">")
            case "warc-target-uri" => targetUri = v
            case "content-type" => contentType = v
            case "content-length" =>
              contentLength = try v.toLong catch { case _: Throwable => -1L }
            case _ => ()
          }
        }
      }
    }
    if (contentLength < 0 || off + contentLength > bytes.length) return None
    val payload = java.util.Arrays.copyOfRange(
      bytes, off, off + contentLength.toInt)
    off += contentLength.toInt
    // HTTP payload split: status line + headers, then body
    var httpStatus: java.lang.Integer = null
    var body = payload
    if (payload.length >= 5 &&
        new String(payload, 0, 5, UTF_8) == "HTTP/") {
      var i = 0
      var sep = -1
      while (sep < 0 && i + 3 < payload.length) {
        if (payload(i) == '\r' && payload(i + 1) == '\n' &&
            payload(i + 2) == '\r' && payload(i + 3) == '\n') sep = i
        i += 1
      }
      if (sep >= 0) {
        val head = new String(payload, 0, sep, UTF_8)
        val statusLine = head.takeWhile(_ != '\r')
        val parts = statusLine.split(" ")
        if (parts.length >= 2)
          httpStatus = try Integer.valueOf(parts(1).toInt)
            catch { case _: Throwable => null }
        body = java.util.Arrays.copyOfRange(payload, sep + 4, payload.length)
      }
    }
    Some((Row(path, warcType, recordId, targetUri, contentType,
      contentLength, httpStatus, body), off))
  }
}
