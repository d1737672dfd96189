package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.schema.ReportSchema

/** Minimal `.xlsx` reader on JDK-only primitives (zip + StAX) — no
  * external dependency, zero-egress-safe.
  *
  * xlsx is a zip of XML parts: `xl/workbook.xml` lists sheets,
  * `xl/worksheets/sheetN.xml` holds cells, `xl/sharedStrings.xml` the
  * string pool, `xl/styles.xml` the number formats (needed to recognize
  * date-styled numeric cells and render them the way pandas
  * `read_excel(dtype=str)` does).
  *
  * Deliberately driver-side: workbook sheets are small by construction
  * (the reference's own model is per-sheet driver read + union;
  * `reports_exporter_v0.83.py:522-528`), and the sniff path reads at most
  * 50 rows. Large distributed inputs use the CSV/parquet paths.
  *
  * Supported cell types: shared string (`t="s"`), inline string
  * (`t="inlineStr"`), literal (`t="str"`), boolean, and numeric —
  * numeric cells with a built-in date format id (14-22, 45-47) or a
  * custom date-like format are rendered as "yyyy-MM-dd HH:mm:ss" from
  * the 1900-epoch serial, everything else as the shortest round-trip
  * decimal (integral serials render without ".0", matching pandas' str
  * of int-valued floats is NOT attempted — the engine re-coerces anyway).
  */
object Xlsx {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  final case class SheetRef(name: String, part: String)

  /** Elapsed-time tokens in a number format: [h]/[mm]/[ss] etc. */
  private[sources] val ElapsedToken = "(?i)\\[[hms]+\\]".r

  /** Sheets in workbook order, resolved to their zip parts through
    * `xl/_rels/workbook.xml.rels` (part numbering does NOT follow sheet
    * order once sheets have been deleted/reordered — the r:id
    * relationship is the only correct mapping).
    */
  def sheetRefs(path: String): Seq[SheetRef] = withZip(path)(sheetRefsOf)

  private def sheetRefsOf(zip: ZipFile): Seq[SheetRef] = {
    val rels: Map[String, String] = {
      val e = zip.getEntry("xl/_rels/workbook.xml.rels")
      if (e == null) Map.empty
      else {
        val in = zip.getInputStream(e)
        try {
          val r = factory.createXMLStreamReader(in)
          val m = Map.newBuilder[String, String]
          while (r.hasNext) {
            if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship")
              for (id <- attr(r, "Id"); target <- attr(r, "Target"))
                m += id -> (if (target.startsWith("/")) target.drop(1)
                            else s"xl/${target.stripPrefix("./")}")
          }
          m.result()
        } finally in.close()
      }
    }
    val wb = zip.getInputStream(zip.getEntry("xl/workbook.xml"))
    try {
      val r = factory.createXMLStreamReader(wb)
      val out = ListBuffer.empty[SheetRef]
      var ordinal = 0
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          ordinal += 1
          val name = attr(r, "name").getOrElse("")
          val part = attr(r, "id").flatMap(rels.get)
            .getOrElse(s"xl/worksheets/sheet$ordinal.xml") // rels-less fallback
          out += SheetRef(name, part)
        }
      }
      out.toList
    } finally wb.close()
  }

  /** Sheet names in workbook order (reference S2). */
  def sheetNames(path: String): Seq[String] = sheetRefs(path).map(_.name)

  /** Read one sheet (by workbook order index) as all-string rows (empty
    * cells are null), up to `maxRows` rows.
    */
  def readSheet(path: String, sheetIndex: Int, maxRows: Int = Int.MaxValue): Seq[Seq[String]] =
    withZip(path) { zip => readSheetOf(zip, sheetIndex, maxRows, path) }

  private def readSheetOf(zip: ZipFile, sheetIndex: Int, maxRows: Int,
      label: String): Seq[Seq[String]] = {
    val refs = sheetRefsOf(zip)
    require(sheetIndex >= 0 && sheetIndex < refs.length,
      s"sheet index $sheetIndex out of range (${refs.length} sheets) in $label")
    val shared = readSharedStrings(zip)
    val dateStyles = readDateStyles(zip)
    val date1904 = readDate1904(zip)
    val entry = Option(zip.getEntry(refs(sheetIndex).part))
      .getOrElse(throw new IllegalArgumentException(
        s"no sheet part ${refs(sheetIndex).part} in $label"))
    val in = zip.getInputStream(entry)
    try parseSheet(in, shared, dateStyles, date1904, maxRows)
    finally in.close()
  }

  /** Parse a whole workbook from its raw bytes — the executor-side entry
    * point of the distributed read ([[XlsxDistributed]]): bytes arrive
    * from a `binaryFile` scan, land in an executor-local temp file (the
    * zip central directory needs random access, which `ZipInputStream`
    * cannot give), and every sheet parses through the same StAX path as
    * the driver-side read. Workbook-sized memory by design — the xlsx
    * format itself is workbook-sized (shared-string pool).
    *
    * @return one entry per sheet in workbook order:
    *   (sheet name, sheet index, all-string rows)
    */
  private[sources] def parseWorkbookBytes(label: String, bytes: Array[Byte],
      maxRows: Int = Int.MaxValue): Seq[(String, Int, Seq[Seq[String]])] = {
    val tmp = java.nio.file.Files.createTempFile("graft-xlsx", ".zip")
    try {
      java.nio.file.Files.write(tmp, bytes)
      withZip(tmp.toString) { zip =>
        val refs = sheetRefsOf(zip)
        val shared = readSharedStrings(zip)
        val dateStyles = readDateStyles(zip)
        val date1904 = readDate1904(zip)
        refs.zipWithIndex.map { case (ref, i) =>
          Option(zip.getEntry(ref.part)) match {
            case None => (ref.name, i, Seq.empty[Seq[String]])
            case Some(entry) =>
              val in = zip.getInputStream(entry)
              try (ref.name, i, parseSheet(in, shared, dateStyles, date1904, maxRows))
              finally in.close()
          }
        }
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** One sheet from raw workbook bytes — the executor-side form of
    * [[readSheet]] ([[XlsxDistributed.readClassifiedSingle]]): bytes
    * land in an executor-local temp file (the zip central directory
    * needs random access) and ONLY the requested sheet parses — the
    * other sheets' XML is never touched, unlike the whole-workbook
    * [[parseWorkbookBytes]].
    */
  private[sources] def readSheetBytes(label: String, bytes: Array[Byte],
      sheetIndex: Int): Seq[Seq[String]] = {
    val tmp = java.nio.file.Files.createTempFile("graft-xlsx", ".zip")
    try {
      java.nio.file.Files.write(tmp, bytes)
      withZip(tmp.toString) { zip =>
        readSheetOf(zip, sheetIndex, Int.MaxValue, label)
      }
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  /** All-string DataFrame of the sheet body below `headerIdx`, with the
    * report's schema (the xlsx analog of HeaderSniffer.readClassified).
    */
  def readClassified(spark: SparkSession, path: String, sheetIndex: Int,
      headerIdx: Int, schema: ReportSchema): DataFrame = {
    val struct = schema.allStringStruct
    val width = struct.size
    val body = readSheet(path, sheetIndex).drop(headerIdx + 1).map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(body.toList), struct)
  }

  // ------------------------------------------------------------- internals

  private def withZip[A](path: String)(f: ZipFile => A): A = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  private def readSharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return IndexedSeq.empty
    val in = zip.getInputStream(e)
    try {
      val r = factory.createXMLStreamReader(in)
      val out = ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ =>
          }
        case _ =>
      }
      out.toIndexedSeq
    } finally in.close()
  }

  /** Workbook date system: `<workbookPr date1904="1"/>` switches serial
    * day 0 from 1899-12-30 (default) to 1904-01-01 (legacy Mac Excel).
    */
  private def readDate1904(zip: ZipFile): Boolean = {
    val e = zip.getEntry("xl/workbook.xml")
    if (e == null) return false
    val in = zip.getInputStream(e)
    try {
      val r = factory.createXMLStreamReader(in)
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "workbookPr")
          return attr(r, "date1904").exists(v => v == "1" || v == "true")
      }
      false
    } finally in.close()
  }

  /** Style indexes (cellXfs order) whose numFmt renders as a date/time. */
  private def readDateStyles(zip: ZipFile): Set[Int] = {
    val e = zip.getEntry("xl/styles.xml")
    if (e == null) return Set.empty
    val builtinDate = (14 to 22).toSet ++ (45 to 47).toSet
    val in = zip.getInputStream(e)
    try {
      val r = factory.createXMLStreamReader(in)
      val customDate = scala.collection.mutable.Set.empty[Int]
      val styleFmts = ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            // '#' marks numeric masks; bracketed TIME tokens ([h], [mm],
            // [ss]) mark elapsed-time codes — durations, not calendar
            // dates; both stay raw. Other bracket uses (locale prefixes
            // like [$-409], colors like [Red]) are still dates.
            for (id <- attr(r, "numFmtId").flatMap(_.toIntOption);
                 code <- attr(r, "formatCode"))
              if (code.exists("ymdhs".contains(_)) && !code.contains("#") &&
                  !Xlsx.ElapsedToken.pattern.matcher(code).find()) customDate += id
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            styleFmts += attr(r, "numFmtId").flatMap(_.toIntOption).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" => inCellXfs = false
        case _ =>
      }
      styleFmts.zipWithIndex.collect {
        case (fmt, idx) if builtinDate(fmt) || customDate(fmt) => idx
      }.toSet
    } finally in.close()
  }

  private def parseSheet(in: InputStream, shared: IndexedSeq[String],
      dateStyles: Set[Int], date1904: Boolean, maxRows: Int): Seq[Seq[String]] = {
    val r = factory.createXMLStreamReader(in)
    val rows = ListBuffer.empty[Seq[String]]
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var cellStyle = -1
    var inV = false
    var inIs = false
    val sb = new StringBuilder
    while (r.hasNext && rows.size < maxRows) r.next() match {
      case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
        case "row" => row = ArrayBuffer.empty[String]
        case "c" if row != null =>
          cellCol = attr(r, "r").map(colIndex).getOrElse(row.length)
          cellType = attr(r, "t").getOrElse("n")
          cellStyle = attr(r, "s").flatMap(_.toIntOption).getOrElse(-1)
          sb.clear()
        case "v" => inV = true
        case "is" => inIs = true
        case "t" if inIs => inV = true
        case _ =>
      }
      case XMLStreamConstants.CHARACTERS if inV => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
        case "v" => inV = false
        case "t" if inIs => inV = false
        case "is" => inIs = false
        case "c" if row != null =>
          val raw = sb.toString
          val value: String = cellType match {
            case "s" => raw.toIntOption.flatMap(shared.lift).orNull
            case "inlineStr" | "str" => raw
            case "b" => if (raw == "1") "TRUE" else "FALSE"
            case _ => // numeric
              if (raw.isEmpty) null
              else if (dateStyles(cellStyle)) renderDateSerial(raw, date1904)
              else raw
          }
          while (row.length < cellCol) row += null
          row += value
          cellCol = -1
        case "row" if row != null =>
          rows += row.toSeq; row = null
        case _ =>
      }
      case _ =>
    }
    rows.toList
  }

  /** "A1" → 0, "AB3" → 27. */
  private def colIndex(ref: String): Int = {
    var acc = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Excel date serial → "yyyy-MM-dd HH:mm:ss" (the rendering the
    * engine's F1 coercion expects). Serial day 0 = 1899-12-30 in the
    * default 1900 system, 1904-01-01 when the workbook sets date1904.
    */
  private def renderDateSerial(raw: String, date1904: Boolean): String = {
    val serial = raw.toDouble
    val epoch =
      if (date1904) java.time.LocalDateTime.of(1904, 1, 1, 0, 0)
      else java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
    val seconds = math.round(serial * 86400.0)
    epoch.plusSeconds(seconds)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
  }
}
