package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.ExtractError

/** The format-independent half of spreadsheet ingestion: a decoded cell
  * grid (sparse (row, col) → typed cell) turned into (inferred schema,
  * data rows). Both Excel container formats — BIFF8 `.xls`
  * ([[XlsSource]]) and OOXML `.xlsx` ([[XlsxSource]]) — produce the same
  * grid after their container/record parsing, and the reference treats
  * both identically through one `pd.read_excel` call
  * (extract.py:60, pandas dispatches on magic bytes), so schema
  * inference, date-serial conversion, and row building live here once.
  */
private[sources] object SheetGrid {

  sealed trait Cell
  final case class NumCell(v: Double) extends Cell
  final case class DateCell(serial: Double) extends Cell
  final case class StrCell(v: String) extends Cell

  /** Excel serial → java.sql.Timestamp (UTC), second precision (the
    * reference formats to seconds, transform.py:27).
    *
    * 1900 system (default): serial 1 == 1900-01-01, with the fictitious
    * 1900-02-29 leap bug handled by the standard -2 day adjustment.
    * 1904 system (`date1904` workbook flag, the old Mac convention an
    * .xlsx can still carry): serial 0 == 1904-01-01, no leap bug.
    */
  def serialToTimestamp(serial: Double, date1904: Boolean = false): Timestamp = {
    val days = serial.toLong
    val frac = serial - days
    val millis =
      if (date1904) {
        val epoch1904 = -2082844800000L // 1904-01-01T00:00:00Z
        epoch1904 + days * 86400000L + math.round(frac * 86400.0) * 1000L
      } else {
        val epoch1900 = -2208988800000L // 1900-01-01T00:00:00Z
        val adjDays = if (days >= 60) days - 1 else days // 1900 leap-year bug
        // serial 1 == 1900-01-01, hence (adjDays - 1) days after the epoch
        epoch1900 + (adjDays - 1) * 86400000L + math.round(frac * 86400.0) * 1000L
      }
    new Timestamp(millis)
  }

  /** Is a number-format code a DATE format? The y/m/d/h/s token scan both
    * Excel decoders apply, but over the format's CODE characters only:
    * double-quoted literal sections (`0.0"m"` renders a unit suffix, not
    * minutes) and backslash-escaped characters (`0\\h`) are display text,
    * so they are stripped before the scan — otherwise a numeric column
    * with a quoted unit decodes as timestamps. `#` anywhere in the code
    * marks a digit-placeholder (numeric) format, same as before.
    */
  def looksLikeDateFormat(formatCode: String): Boolean = {
    val sb = new java.lang.StringBuilder(formatCode.length)
    var i = 0
    var inQuote = false
    while (i < formatCode.length) {
      val c = formatCode.charAt(i)
      if (inQuote) { if (c == '"') inQuote = false }
      else if (c == '"') inQuote = true
      else if (c == '\\') i += 1 // escaped literal: skip the next char
      else sb.append(c)
      i += 1
    }
    val code = sb.toString.toLowerCase
    code.exists("ymdhs".contains(_)) && !code.contains("#")
  }

  /** Grid → (schema, rows). Row 0 is the header (missing/non-string
    * header cells fall back to `col_N`). Column type = timestamp if ALL
    * non-null data cells are date-formatted numbers; double if all
    * numeric; else string — the same inference pandas applies per
    * column, so both engines agree on the reference fixture.
    */
  def tableFromCells(cells: Map[(Int, Int), Cell], path: String,
                     date1904: Boolean = false): (StructType, Seq[Seq[Any]]) = {
    if (cells.isEmpty) throw ExtractError(s"No cells decoded from spreadsheet at $path")
    val nCols = cells.keys.map(_._2).max + 1
    val nRows = cells.keys.map(_._1).max + 1
    if (nRows < 2)
      throw ExtractError(s"Spreadsheet at $path has a header but no data rows")

    val header = (0 until nCols).map { c =>
      cells.get((0, c)) match {
        case Some(StrCell(s)) => s
        case other            => s"col_$c"
      }
    }

    val colTypes = (0 until nCols).map { c =>
      val vals = (1 until nRows).flatMap(r => cells.get((r, c)))
      if (vals.nonEmpty && vals.forall(_.isInstanceOf[DateCell])) TimestampType
      else if (vals.nonEmpty && vals.forall(v =>
        v.isInstanceOf[NumCell] || v.isInstanceOf[DateCell])) DoubleType
      else StringType
    }

    val schema = StructType(header.zip(colTypes).map {
      case (name, t) => StructField(name, t, nullable = true)
    })
    val rows: Seq[Seq[Any]] = (1 until nRows).map { r =>
      (0 until nCols).map { c =>
        (cells.get((r, c)), colTypes(c)) match {
          case (Some(DateCell(serial)), TimestampType) => serialToTimestamp(serial, date1904)
          case (Some(NumCell(d)), TimestampType)       => serialToTimestamp(d, date1904)
          case (Some(NumCell(d)), DoubleType)          => d
          case (Some(DateCell(d)), DoubleType)         => d
          case (Some(StrCell(s)), StringType)          => s
          case (Some(NumCell(d)), StringType)          => d.toString
          case (Some(DateCell(d)), StringType)         => serialToTimestamp(d, date1904).toString
          case _                                       => null
        }
      }
    }
    (schema, rows)
  }

  /** Read a whole blob via the Hadoop FileSystem API so any scheme works
    * (file://, gs://, s3a://) — the reference's GCS download-to-tempfile
    * hop (extract.py:18-52) collapses into this one call.
    */
  def readAllBytes(conf: org.apache.hadoop.conf.Configuration,
                   path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) throw ExtractError(s"Spreadsheet not found at $path")
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      in.readFully(0, buf)
      buf
    } finally in.close()
  }
}
