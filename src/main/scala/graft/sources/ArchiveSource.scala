package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** Archive explode — the reference's 1-blob -> N-records sources, rebuilt
  * JDK-only (no Tika/POI in this container): the PST reader emits one
  * record per embedded message with metadata
  * (`PontusMSOfficePSTReaderRecord.java:242-256`), the PPTX reader walks
  * slides (`PontusMSOfficePPTXReaderRecord.java:142-176`), and the
  * production flow uses `UnpackContent` / `ConvertExcelToCSVProcessor`
  * for the same shape. A zip container covers the modern variants
  * outright (pptx/xlsx/docx ARE zip archives of XML parts).
  *
  * Spark-side: `mapPartitions` over binary payloads (one codec instance
  * per partition, streaming decode per blob — never the whole archive
  * decompressed into one buffer beyond the entry being read). At 100 TB
  * archives parallelize per blob; size partitions by bytes
  * (`spark.sql.files.maxPartitionBytes`), not rows.
  */
object ArchiveSource {

  /** One exploded archive entry. `payload` is the entry's decompressed
    * bytes; `n_bytes` its decompressed size.
    */
  final case class ArchiveEntry(
      archive_id: Long,
      entry_name: String,
      n_bytes: Int,
      payload: Array[Byte])

  /** One extracted slide. `slide_idx` is 1-based (pptx slide numbering). */
  final case class SlideText(archive_id: Long, slide_idx: Int, text: String)

  private val MaxEntryBytes = 256 << 20 // 256 MiB per entry: zip-bomb guard

  /** Explode zip archives: one row per entry (directories skipped).
    * Frame contract: (`idCol`: long, `payloadCol`: binary). A payload
    * that is not a zip (or null/empty) yields zero entries — the
    * dead-letter decision belongs to the caller, which can anti-join
    * exploded ids against input ids to find undecodable blobs.
    */
  def explodeZip(archives: DataFrame, idCol: String = "archive_id",
      payloadCol: String = "payload"): Dataset[ArchiveEntry] = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { blobs =>
        blobs.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else zipEntries(bytes).map { case (name, data) =>
            ArchiveEntry(id, name, data.length, data)
          }
        }
      }
  }

  /** PPTX slide-text extraction: slides live at `ppt/slides/slideN.xml`;
    * visible text is the character content of DrawingML `<a:t>` runs,
    * runs concatenated within a paragraph and paragraphs joined with
    * newlines. JDK SAX parser, external entities disabled.
    */
  def pptxSlideText(archives: DataFrame, idCol: String = "archive_id",
      payloadCol: String = "payload"): Dataset[SlideText] = {
    val spark = archives.sparkSession
    import spark.implicits._
    val slideRe = "^ppt/slides/slide([0-9]+)\\.xml$".r
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { blobs =>
        blobs.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else zipEntries(bytes).flatMap { case (name, data) =>
            name match {
              case slideRe(n) => Some(SlideText(id, n.toInt, slideVisibleText(data)))
              case _ => None
            }
          }
        }
      }
  }

  /** One extracted spreadsheet cell. `row_idx` is the 1-based row,
    * `col_idx` the 1-based column (A=1); `value` the cell's text — shared
    * or inline strings resolved, numeric cells kept as their raw `<v>`
    * text.
    */
  final case class XlsxCell(
      archive_id: Long, sheet_idx: Int, row_idx: Int, col_idx: Int, value: String)

  /** XLSX cell extraction — the reference's `ConvertExcelToCSVProcessor`
    * (2 instances in the production flow) rebuilt JDK-only: xlsx is a zip
    * of XML parts exactly like pptx, with worksheets at
    * `xl/worksheets/sheetN.xml` (`<c r="B3" t="s"><v>idx</v></c>`) and
    * shared strings at `xl/sharedStrings.xml` (`<si><t>…</t></si>`,
    * possibly split into multiple runs). Same SAX pattern as
    * [[pptxSlideText]], external entities disabled. The archive's entries
    * are materialized per blob (sharedStrings must resolve before sheets
    * and zip entry order is not guaranteed) — workbooks are metadata-sized
    * next to the data they describe, and the per-entry zip-bomb guard
    * still applies.
    */
  def xlsxCells(archives: DataFrame, idCol: String = "archive_id",
      payloadCol: String = "payload"): Dataset[XlsxCell] = {
    val spark = archives.sparkSession
    import spark.implicits._
    val sheetRe = "^xl/worksheets/sheet([0-9]+)\\.xml$".r
    archives.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { blobs =>
        blobs.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            val entries = zipEntries(bytes).toSeq
            val sst = entries.collectFirst {
              case ("xl/sharedStrings.xml", data) => parseSharedStrings(data)
            }.getOrElse(IndexedSeq.empty)
            entries.iterator.flatMap { case (name, data) =>
              name match {
                case sheetRe(n) => sheetCells(data, sst).map { case (r, c, v) =>
                  XlsxCell(id, n.toInt, r, c, v)
                }
                case _ => Nil
              }
            }
          }
        }
      }
  }

  /** `xl/sharedStrings.xml` -> indexed strings (text runs within one
    * `<si>` concatenated, like Excel renders them).
    */
  private[graft] def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val sb = new StringBuilder
    var inT = false
    saxParse(xml, new org.xml.sax.helpers.DefaultHandler {
      override def startElement(uri: String, local: String, qn: String,
          atts: org.xml.sax.Attributes): Unit = local match {
        case "si" => sb.clear()
        case "t" => inT = true
        case _ => ()
      }
      override def endElement(uri: String, local: String, qn: String): Unit =
        local match {
          case "si" => out += sb.result()
          case "t" => inT = false
          case _ => ()
        }
      override def characters(ch: Array[Char], start: Int, len: Int): Unit =
        if (inT) sb.appendAll(ch, start, len)
    })
    out.result()
  }

  /** One worksheet XML -> (row, col, value) cells. Handles shared-string
    * (`t="s"`), inline-string (`t="inlineStr"`) and raw-value cells;
    * empty cells (no value child) are skipped.
    */
  private[graft] def sheetCells(xml: Array[Byte],
      sst: IndexedSeq[String]): Seq[(Int, Int, String)] = {
    val out = Seq.newBuilder[(Int, Int, String)]
    val sb = new StringBuilder
    var cellRef = ""
    var cellType = ""
    var capture = false
    var sawValue = false
    saxParse(xml, new org.xml.sax.helpers.DefaultHandler {
      override def startElement(uri: String, local: String, qn: String,
          atts: org.xml.sax.Attributes): Unit = local match {
        case "c" =>
          cellRef = Option(atts.getValue("r")).getOrElse("")
          cellType = Option(atts.getValue("t")).getOrElse("")
          sb.clear(); sawValue = false
        case "v" => capture = true; sawValue = true
        case "t" if cellType == "inlineStr" => capture = true; sawValue = true
        case _ => ()
      }
      override def endElement(uri: String, local: String, qn: String): Unit =
        local match {
          case "v" | "t" => capture = false
          case "c" if sawValue && cellRef.nonEmpty =>
            val (row, colIdx) = parseCellRef(cellRef)
            val raw = sb.result()
            val value = cellType match {
              case "s" => raw.toIntOption.flatMap(sst.lift).getOrElse(raw)
              case _ => raw
            }
            out += ((row, colIdx, value))
          case _ => ()
        }
      override def characters(ch: Array[Char], start: Int, len: Int): Unit =
        if (capture) sb.appendAll(ch, start, len)
    })
    out.result()
  }

  /** "B3" -> (row=3, col=2). */
  private[graft] def parseCellRef(ref: String): (Int, Int) = {
    val letters = ref.takeWhile(_.isLetter)
    val digits = ref.drop(letters.length)
    val colIdx = letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1))
    (digits.toInt, colIdx)
  }

  private def saxParse(xml: Array[Byte],
      handler: org.xml.sax.helpers.DefaultHandler): Unit = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    factory.newSAXParser().parse(new ByteArrayInputStream(xml), handler)
  }

  /** Stream a zip payload's file entries as (name, bytes). */
  private[graft] def zipEntries(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      private var nextEntry: ZipEntry = advance()
      private def advance(): ZipEntry = {
        var e = zin.getNextEntry
        while (e != null && e.isDirectory) e = zin.getNextEntry
        if (e == null) zin.close()
        e
      }
      def hasNext: Boolean = nextEntry != null
      def next(): (String, Array[Byte]) = {
        val e = nextEntry
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = zin.read(chunk)
        while (n >= 0) {
          buf.write(chunk, 0, n)
          if (buf.size > MaxEntryBytes)
            throw new IllegalStateException(
              s"zip entry ${e.getName} exceeds $MaxEntryBytes bytes")
          n = zin.read(chunk)
        }
        nextEntry = advance()
        (e.getName, buf.toByteArray)
      }
    }

  /** Visible text of one slide XML: `<a:t>` character runs, paragraphs
    * (`<a:p>`) joined with '\n'.
    */
  private[sources] def slideVisibleText(xml: Array[Byte]): String = {
    val factory = javax.xml.parsers.SAXParserFactory.newInstance()
    factory.setNamespaceAware(true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val sb = new StringBuilder
    val handler = new org.xml.sax.helpers.DefaultHandler {
      private var inT = false
      private var sawText = false
      override def startElement(uri: String, local: String, qn: String,
          atts: org.xml.sax.Attributes): Unit = {
        if (local == "t") inT = true
        if (local == "p" && sawText) { sb.append('\n'); sawText = false }
      }
      override def endElement(uri: String, local: String, qn: String): Unit =
        if (local == "t") inT = false
      override def characters(ch: Array[Char], start: Int, len: Int): Unit =
        if (inT) { sb.appendAll(ch, start, len); sawText = true }
    }
    factory.newSAXParser().parse(new ByteArrayInputStream(xml), handler)
    sb.result()
  }

  // ---- deterministic builders (tests + synthetic catalog queries) -------

  /** Build a zip from (name, bytes) entries, deterministic byte-for-byte:
    * fixed mod-time, no extra fields.
    */
  def zipBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val zout = new ZipOutputStream(out)
    entries.foreach { case (name, data) =>
      val e = new ZipEntry(name)
      e.setTime(0L)
      zout.putNextEntry(e)
      zout.write(data)
      zout.closeEntry()
    }
    zout.close()
    out.toByteArray
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }

  /** 1-based column index -> A1-style letters (1=A, 27=AA). */
  private[graft] def colLetters(idx: Int): String = {
    var n = idx
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.result()
  }

  /** Minimal valid-for-extraction xlsx: one worksheet, cells that parse
    * as integers written as numeric `<v>` values, everything else routed
    * through `xl/sharedStrings.xml` (first-occurrence order) — the two
    * cell encodings Excel itself emits, so the extractor's sst-resolution
    * path is genuinely exercised. Deterministic byte-for-byte.
    */
  def xlsxBytes(rows: Seq[Seq[String]]): Array[Byte] = {
    val sstIndex = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def isNumeric(s: String) = s.nonEmpty && s.matches("-?[0-9]+(\\.[0-9]+)?")
    val cellsXml = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) =>
        val ref = s"${colLetters(c + 1)}${r + 1}"
        if (isNumeric(v)) s"""<c r="$ref"><v>$v</v></c>"""
        else {
          val i = sstIndex.getOrElseUpdate(v, sstIndex.size)
          s"""<c r="$ref" t="s"><v>$i</v></c>"""
        }
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    val main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="$main"><sheetData>$cellsXml</sheetData></worksheet>"""
        .stripMargin
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="$main" count="${sstIndex.size}" uniqueCount="${sstIndex.size}">
         |${sstIndex.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString}
         |</sst>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin
    zipBytes(Seq(
      "[Content_Types].xml" -> contentTypes.getBytes(StandardCharsets.UTF_8),
      "xl/sharedStrings.xml" -> sst.getBytes(StandardCharsets.UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(StandardCharsets.UTF_8)))
  }

  /** Minimal valid-for-extraction pptx: one slide XML per text, one
    * paragraph with one run each (the slide XML shape the extractor —
    * and the reference's POI walk — reads).
    */
  def pptxBytes(slideTexts: Seq[String]): Array[Byte] = {
    val a = "http://schemas.openxmlformats.org/drawingml/2006/main"
    val p = "http://schemas.openxmlformats.org/presentationml/2006/main"
    val slides = slideTexts.zipWithIndex.map { case (text, i) =>
      val xml =
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<p:sld xmlns:a="$a" xmlns:p="$p"><p:cSld><p:spTree><p:sp><p:txBody>
           |<a:p><a:r><a:t>${xmlEscape(text)}</a:t></a:r></a:p>
           |</p:txBody></p:sp></p:spTree></p:cSld></p:sld>""".stripMargin
      s"ppt/slides/slide${i + 1}.xml" -> xml.getBytes(StandardCharsets.UTF_8)
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="xml" ContentType="application/xml"/></Types>""".stripMargin
    zipBytes(("[Content_Types].xml" ->
      contentTypes.getBytes(StandardCharsets.UTF_8)) +: slides)
  }
}
