package graft.formats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** Result serialization in the reference's output formats: TSV
  * (default), TabSeparatedWithNames, CSV(WithNames), JSON, JSONCompact
  * (the `{meta, data, rows, statistics}` ClickHouse envelope that the
  * Play UI consumes — /root/reference/public/index.html:706-712,
  * lambda/lambda.py:10), Pretty, and the binary Native block codec
  * ([[NativeCodec]]).
  *
  * Driver-side by design: formats exist to answer protocol/API
  * responses (bounded result sets), not bulk export — bulk data moves
  * through parquet sinks.
  */
object ResultFormatter {

  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  /** Render collected rows in the named format (text formats). */
  def render(df: DataFrame, format: String): String = {
    val t0 = System.nanoTime()
    val schema = df.schema
    val rows = df.collect()
    val elapsed = (System.nanoTime() - t0) / 1e9
    format.toLowerCase match {
      case "tsv" | "tabseparated" => delimited(schema, rows, "\t", header = false)
      case "tsvwithnames" | "tabseparatedwithnames" =>
        delimited(schema, rows, "\t", header = true)
      case "tsvwithnamesandtypes" | "tabseparatedwithnamesandtypes" =>
        delimited(schema, rows, "\t", header = true, typesRow = true)
      case "csv" => delimited(schema, rows, ",", header = false, csvQuote = true)
      case "csvwithnames" => delimited(schema, rows, ",", header = true, csvQuote = true)
      case "csvwithnamesandtypes" =>
        delimited(schema, rows, ",", header = true, csvQuote = true, typesRow = true)
      case "json" => jsonEnvelope(schema, rows, elapsed, compact = false)
      case "jsoncompact" => jsonEnvelope(schema, rows, elapsed, compact = true)
      case "jsoneachrow" | "ndjson" =>
        rows.map(r => schema.fields.indices
          .map(i => s"${jsonString(schema.fields(i).name)}:${jsonValue(r.get(i), schema.fields(i).dataType)}")
          .mkString("{", ",", "}")).mkString("", "\n", "\n")
      case "jsoncompacteachrow" =>
        rows.map(r => schema.fields.indices
          .map(i => jsonValue(r.get(i), schema.fields(i).dataType))
          .mkString("[", ",", "]")).mkString("", "\n", "\n")
      case "pretty" | "prettycompact" => pretty(schema, rows)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }

  // ---- text value rendering (ClickHouse text-format rules) ----

  def textValue(v: Any, dt: DataType): String = v match {
    case null => "\\N"
    case d: java.sql.Date => dateFmt.format(d.toLocalDate)
    case d: java.time.LocalDate => dateFmt.format(d)
    case t: java.sql.Timestamp => tsFmt.format(t.toInstant)
    case t: java.time.Instant => tsFmt.format(t)
    case b: Boolean => if (b) "1" else "0"
    case d: java.math.BigDecimal => d.toPlainString
    case s: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      s.map(e => arrayElement(e, et)).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      val mt = dt.asInstanceOf[MapType]
      m.map { case (k, x) =>
        s"${arrayElement(k, mt.keyType)}:${arrayElement(x, mt.valueType)}"
      }.mkString("{", ",", "}")
    case r: Row =>
      val st = dt.asInstanceOf[StructType]
      r.toSeq.zip(st.fields).map { case (e, f) => arrayElement(e, f.dataType) }
        .mkString("(", ",", ")")
    case b: Array[Byte] => new String(b, "UTF-8")
    case other => other.toString
  }

  /** Inside arrays/maps/tuples ClickHouse quotes strings and dates. */
  private def arrayElement(v: Any, dt: DataType): String = v match {
    case null => "NULL"
    case _: String => "'" + v.toString.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case _: java.sql.Date | _: java.time.LocalDate |
         _: java.sql.Timestamp | _: java.time.Instant =>
      "'" + textValue(v, dt) + "'"
    case _ => textValue(v, dt)
  }

  private def tsvEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  private def csvQuoteStr(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  private def delimited(schema: StructType, rows: Array[Row], sep: String,
                        header: Boolean, csvQuote: Boolean = false,
                        typesRow: Boolean = false): String = {
    val sb = new StringBuilder
    if (header) sb.append(schema.fieldNames.mkString(sep)).append('\n')
    if (typesRow) // ...AndTypes: second header row with ClickHouse type names
      sb.append(schema.fields.map(ChTypeNames.fieldName).mkString(sep)).append('\n')
    rows.foreach { r =>
      val cells = schema.fields.indices.map { i =>
        if (r.isNullAt(i)) { if (csvQuote) "\\N" else "\\N" }
        else {
          val raw = textValue(r.get(i), schema.fields(i).dataType)
          if (csvQuote) csvQuoteStr(raw) else tsvEscape(raw)
        }
      }
      sb.append(cells.mkString(sep)).append('\n')
    }
    sb.toString
  }

  // ---- JSON envelope ----

  private def jsonString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** ClickHouse JSON value rules: 64-bit ints quoted (matches
    * output_format_json_quote_64bit_integers=1 default), dates quoted,
    * NULL -> null. */
  def jsonValue(v: Any, dt: DataType): String = v match {
    case null => "null"
    case _: Long | _: java.math.BigDecimal => jsonString(textValue(v, dt))
    case _: Int | _: Short | _: Byte => v.toString
    case d: Double => if (d.isNaN || d.isInfinite) "null" else d.toString
    case f: Float => if (f.isNaN || f.isInfinite) "null" else f.toString
    case b: Boolean => if (b) "1" else "0"
    case s: String => jsonString(s)
    case _: java.sql.Date | _: java.time.LocalDate |
         _: java.sql.Timestamp | _: java.time.Instant =>
      jsonString(textValue(v, dt))
    case s: scala.collection.Seq[_] =>
      val et = dt.asInstanceOf[ArrayType].elementType
      s.map(e => jsonValue(e, et)).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      val mt = dt.asInstanceOf[MapType]
      m.map { case (k, x) =>
        s"${jsonString(textValue(k, mt.keyType))}:${jsonValue(x, mt.valueType)}"
      }.mkString("{", ",", "}")
    case other => jsonString(textValue(other, dt))
  }

  private def jsonEnvelope(schema: StructType, rows: Array[Row],
                           elapsed: Double, compact: Boolean): String = {
    val meta = schema.fields.map(f =>
      s"""{"name":${jsonString(f.name)},"type":${jsonString(ChTypeNames.fieldName(f))}}""")
      .mkString("[", ",", "]")
    val data =
      if (compact)
        rows.map(r => schema.fields.indices
          .map(i => jsonValue(r.get(i), schema.fields(i).dataType))
          .mkString("[", ",", "]")).mkString("[", ",", "]")
      else
        rows.map(r => schema.fields.indices
          .map(i => s"${jsonString(schema.fields(i).name)}:${jsonValue(r.get(i), schema.fields(i).dataType)}")
          .mkString("{", ",", "}")).mkString("[", ",", "]")
    val stats = f"""{"elapsed":$elapsed%.6f,"rows_read":${rows.length},"bytes_read":0}"""
    s"""{"meta":$meta,"data":$data,"rows":${rows.length},"statistics":$stats}"""
  }

  private def pretty(schema: StructType, rows: Array[Row]): String = {
    val header = schema.fieldNames
    val cells = rows.map(r => schema.fields.indices
      .map(i => textValue(r.get(i), schema.fields(i).dataType)).toArray)
    val widths = header.indices.map(i =>
      (cells.map(_(i).length) :+ header(i).length).max)
    def line(c: Array[String]) =
      c.zip(widths).map { case (s, w) => s.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val bar = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(bar, line(header.toArray), bar) ++ cells.map(line) :+ bar).mkString("", "\n", "\n")
  }
}
