package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Page

/** WARC/1.0 source — the container Common-Crawl-style corpora actually
  * arrive in (the north rule's input shape). From-scratch writer and
  * reader for response records, in both plain and per-record
  * gzip-member framing (the standard `.warc.gz` layout: each record its
  * own gzip member, members concatenated; `GZIPInputStream` reads the
  * member chain natively).
  *
  * Scale shape: WARC gzip members are NOT splittable mid-file, so the
  * unit of parallelism is the file — exactly how production crawls are
  * processed (many ~1 GB files, one task each). `pages()` reads via the
  * binaryFile source and parses per file inside the task; payload bytes
  * never leave the task until the downstream operator (e.g. the extract
  * kernel) consumes them.
  *
  * Parsing is total and bounded: a record whose Content-Length is
  * negative, non-numeric, over the per-record cap, or past the buffer
  * ends the file's record stream at that point (records before it are
  * kept) — a torn tail file yields its intact prefix, never a throw.
  */
object Warc {

  /** Per-record payload bound: the engine's content cap plus header
    * slack — a forged Content-Length cannot force a huge allocation.
    */
  val MaxRecordPayload: Int = graft.kernel.MergeSpec.MaxContentLength + 65536

  /** Fixed WARC-Date for deterministic fixtures (the field is required
    * by the spec but carries no engine semantics here).
    */
  val FixtureDate = "2024-01-01T00:00:00Z"

  final case class WarcRecord(url: String, warcType: String, payload: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize records; `gzipMembers` wraps EACH record in its own gzip
    * member (the `.warc.gz` convention that keeps files seekable per
    * record index).
    */
  /** Shields the shared output from per-member close(): closing a
    * GZIPOutputStream is the only way to release its native Deflater,
    * but it must not close the underlying file between members.
    */
  private final class NonClosing(out: java.io.OutputStream)
      extends java.io.FilterOutputStream(out) {
    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      out.write(b, off, len)
    override def close(): Unit = out.flush()
  }

  def write(records: Iterator[WarcRecord], out: java.io.OutputStream,
      gzipMembers: Boolean): Unit = {
    records.foreach { r =>
      val sink =
        if (gzipMembers)
          new java.util.zip.GZIPOutputStream(new NonClosing(out), 8192, true)
        else out
      val hdr = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: ").append(r.warcType).append("\r\n")
        .append("WARC-Target-URI: ").append(r.url).append("\r\n")
        .append("WARC-Date: ").append(FixtureDate).append("\r\n")
        .append("Content-Length: ").append(r.payload.length).append("\r\n")
        .append("\r\n")
      sink.write(hdr.toString.getBytes("US-ASCII"))
      sink.write(r.payload)
      sink.write(Crlf); sink.write(Crlf) // record separator
      sink match {
        // close() ends the member AND releases the native Deflater —
        // finish() alone leaks ~256 KB of zlib state per record until GC
        case g: java.util.zip.GZIPOutputStream => g.close()
        case _ => ()
      }
    }
    out.flush()
  }

  /** Parse a WARC file's bytes (plain or gzip-member framed). */
  def parse(bytes: Array[Byte]): Vector[WarcRecord] = {
    if (bytes == null || bytes.length < 4) return Vector.empty
    val b =
      if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) gunzipAll(bytes)
      else bytes
    if (b == null) return Vector.empty
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < b.length) {
      // skip inter-record blank lines
      while (pos + 1 < b.length && b(pos) == '\r' && b(pos + 1) == '\n') pos += 2
      if (pos >= b.length) ok = false
      else {
        val hdrEnd = indexOfDoubleCrlf(b, pos)
        if (hdrEnd < 0) ok = false
        else {
          val header = new String(b, pos, hdrEnd - pos, "US-ASCII")
          val lines = header.split("\r\n")
          if (lines.isEmpty || !lines(0).startsWith("WARC/")) ok = false
          else {
            var url = ""
            var wtype = ""
            var clen = -1L
            lines.iterator.drop(1).foreach { l =>
              val i = l.indexOf(':')
              if (i > 0) {
                val k = l.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
                val v = l.substring(i + 1).trim
                k match {
                  case "warc-target-uri" => url = v
                  case "warc-type"       => wtype = v
                  case "content-length" =>
                    clen = try v.toLong catch { case _: NumberFormatException => -1L }
                  case _ => ()
                }
              }
            }
            val start = hdrEnd + 4
            if (clen < 0 || clen > MaxRecordPayload || start + clen > b.length) ok = false
            else {
              out += WarcRecord(url, wtype,
                java.util.Arrays.copyOfRange(b, start, start + clen.toInt))
              pos = start + clen.toInt
            }
          }
        }
      }
    }
    out.result()
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Inflate a whole multi-member gzip stream; null on corruption. */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 65536)
      val out = new java.io.ByteArrayOutputStream(b.length * 3)
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > (1 << 30)) return null // stream bomb bound
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  /** Write a pages frame as `parts` gzip-member WARC files under `dir`
    * (distributed: one file per output partition, payloads never
    * collect to the driver).
    */
  /** Shared distributed staging core: `toRecord` rows of any frame
    * (already url-keyed by the caller's repartition) as gzip-member WARC
    * files, one per partition, written through the Hadoop filesystem
    * (NOT executor-local java.io — on a real cluster the staged files
    * must land where every reader task can list them; overwrite=true
    * keeps re-staging idempotent; task-side Configuration resolves the
    * default FS from the classpath's core-site, the standard pattern).
    * ONE implementation so the staging contract snapshotIdOf depends on
    * (fixed part names + fresh length/mtime) cannot diverge per caller.
    */
  private def stageRecords[T](ds: Dataset[T], dir: String, parts: Int,
      key: org.apache.spark.sql.Column)(toRecord: T => WarcRecord): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(
      ds.sparkSession.sparkContext.hadoopConfiguration).mkdirs(dirPath): Unit
    ds.repartition(parts, key).foreachPartition { (it: Iterator[T]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val f = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.warc.gz")
      val fs = f.getFileSystem(new org.apache.hadoop.conf.Configuration())
      val out = new java.io.BufferedOutputStream(fs.create(f, true))
      try write(it.map(toRecord), out, gzipMembers = true)
      finally out.close()
    }
  }

  def stagePages(pages: Dataset[Page], dir: String, parts: Int): Unit =
    stageRecords(pages, dir, parts, col("url"))(p =>
      WarcRecord(p.url, "response",
        if (p.html == null) Array.emptyByteArray else p.html))

  /** True when `dir` holds WARC files (the crawl arrival layout) rather
    * than parquet — lets the runner accept either input format.
    */
  def isWarcDir(s: SparkSession, dir: String): Boolean = {
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).exists { st =>
        val n = st.getPath.getName
        n.endsWith(".warc.gz") || n.endsWith(".warc")
      }
    } catch { case _: java.io.IOException => false }
  }

  /** Snapshot id over the WARC file listing — same stable-hash contract
    * as ExtractJob.snapshotIdOf for parquet inputs, so lineage/resume
    * semantics are input-format-independent. Length and mtime fold in
    * alongside the path: stagePages reuses fixed part-NNNNN names, so a
    * dir re-staged IN PLACE with new content must produce a NEW
    * snapshot id — otherwise resume would silently skip the fresh data
    * (the same in-place-rewrite hazard Similarity.embeddingsFingerprint
    * guards its codebook memo against).
    */
  def snapshotIdOf(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(p).sortBy(_.getPath.toString).foldLeft(17L) { (acc, st) =>
      ((acc * 31L + st.getPath.toString.hashCode.toLong) * 31L + st.getLen) * 31L +
        st.getModificationTime
    }
  }

  /** Read a directory of WARC files as records of one type: one task
    * per file (the non-splittable-member reality), parsed in-task.
    */
  def records(s: SparkSession, dir: String,
      warcType: String): Dataset[(String, Array[Byte])] = {
    import s.implicits._
    s.read.format("binaryFile").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(b => parse(b).iterator
        .filter(_.warcType == warcType)
        .map(r => (r.url, r.payload)))
  }

  /** Crawl-input view: `response` records as pages. */
  def pages(s: SparkSession, dir: String): Dataset[Page] = {
    import s.implicits._
    records(s, dir, "response").map { case (url, payload) =>
      Page(url, null, payload, "", "")
    }
  }

  /** WET-style OUTPUT: completed extracted docs written as WARC
    * `conversion` records (the Common-Crawl WET convention — extracted
    * text riding the same container as the crawl itself), gzip-member
    * files, one per partition, through the Hadoop filesystem.
    */
  def stageExtracted(extracted: Dataset[graft.model.Extracted], dir: String,
      parts: Int): Unit =
    stageRecords(extracted.filter(col("status") === "completed"), dir, parts,
      col("url"))(e => WarcRecord(e.url, "conversion", e.text.getBytes("UTF-8")))
}
