package graft.gen

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.util.zip.GZIPOutputStream

import graft.model.Page

/** Serializes [[Page]] rows into spec-shaped WARC files (ISO 28500
  * response records carrying an HTTP/1.1 message) — the test/demo twin of
  * [[graft.sources.WarcDataSource]]. Deterministic: record ids derive
  * from the url, dates from the page's own warc_ts. */
object WarcGen {

  private val Ascii = "ISO-8859-1"

  def httpPayload(html: Array[Byte], contentType: String): Array[Byte] = {
    val head = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\nContent-Length: ${html.length}\r\n\r\n"
    val out = new ByteArrayOutputStream(head.length + html.length)
    out.write(head.getBytes(Ascii))
    out.write(html)
    out.toByteArray
  }

  def record(warcType: String, uri: String, ts: java.sql.Timestamp,
      contentType: String, payload: Array[Byte]): Array[Byte] =
    recordAt(warcType, uri,
      // full Timestamp precision: getTime carries millis, the nanos field
      // the sub-millisecond remainder
      Instant.ofEpochMilli(ts.getTime).plusNanos(ts.getNanos % 1000000L),
      contentType, payload)

  /** Microsecond-exact variant — the production sink path
    * ([[graft.sources.WarcDataWriter]]) formats WARC-Date straight from
    * the Catalyst micros so a read→write→read roundtrip preserves
    * sub-millisecond timestamps exactly (ADVICE r4). */
  def recordMicros(warcType: String, uri: String, micros: Long,
      contentType: String, payload: Array[Byte]): Array[Byte] =
    recordAt(warcType, uri,
      Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L),
      contentType, payload)

  private def recordAt(warcType: String, uri: String, inst: Instant,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val date = DateTimeFormatter.ISO_INSTANT.format(inst)
    // A real (RFC 4122 type-3) UUID, unique per (uri, date, type) — the
    // spec requires globally-unique record ids and external consumers key
    // on them (ADVICE r4: the old hex(hashCode) collided across records).
    // Deterministic on purpose: the generator is also the golden/test
    // corpus writer.
    val rid = java.util.UUID.nameUUIDFromBytes(
      s"$uri\u0000$date\u0000$warcType".getBytes(Ascii))
    val sb = new StringBuilder()
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    sb.append(s"WARC-Record-ID: <urn:uuid:$rid>\r\n")
    if (uri.nonEmpty) sb.append(s"WARC-Target-URI: $uri\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"Content-Type: $contentType\r\n")
    sb.append(s"Content-Length: ${payload.length}\r\n")
    sb.append("\r\n")
    val out = new ByteArrayOutputStream(sb.length + payload.length + 4)
    out.write(sb.toString.getBytes(Ascii))
    out.write(payload)
    out.write("\r\n\r\n".getBytes(Ascii))
    out.toByteArray
  }

  def responseRecord(p: Page): Array[Byte] =
    record("response", p.url, p.warc_ts, "application/http; msgtype=response",
      httpPayload(p.html, "text/html"))

  /** A warcinfo leader record (crawls start every file with one) — the
    * default reader mode must skip it. */
  def warcinfoRecord(ts: java.sql.Timestamp): Array[Byte] =
    record("warcinfo", "", ts, "application/warc-fields",
      "software: graft-warcgen\r\n".getBytes(Ascii))

  def warcBytes(pages: Seq[Page], withWarcinfo: Boolean = true): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (withWarcinfo && pages.nonEmpty) out.write(warcinfoRecord(pages.head.warc_ts))
    pages.foreach(p => out.write(responseRecord(p)))
    out.toByteArray
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Writes `pages` into `ceil(n/perFile)` files under `dir`
    * (`part-NNN.warc` or `.warc.gz`, numbering from `startIndex` so
    * successive calls emit monotonically-named segments — the crawl
    * convention the streaming source relies on). Returns the paths. */
  def writeFiles(dir: String, pages: Seq[Page], perFile: Int, gzipped: Boolean,
      startIndex: Int = 0): Seq[String] = {
    Files.createDirectories(Paths.get(dir))
    pages.grouped(perFile).zipWithIndex.map { case (group, i) =>
      val ext = if (gzipped) ".warc.gz" else ".warc"
      val path = s"$dir/part-${"%03d".format(startIndex + i)}$ext"
      val bytes = warcBytes(group)
      val fos = new FileOutputStream(path)
      try fos.write(if (gzipped) gzip(bytes) else bytes)
      finally fos.close()
      path
    }.toSeq
  }

  /** One file made of TWO independent gzip members (the concatenated
    * layout real crawls use: one member per record batch) — the reader
    * must surface all records. */
  def writeMultiMemberGz(path: String, first: Seq[Page], second: Seq[Page]): Unit = {
    val fos = new FileOutputStream(path)
    try {
      fos.write(gzip(warcBytes(first)))
      fos.write(gzip(warcBytes(second, withWarcinfo = false)))
    } finally fos.close()
  }
}
