package graft.engine

import org.apache.spark.sql.DataFrame

/** Column-oriented result serialization — the Spark analog of the
  * reference's `ColumnarDataTable` (query/src/lib.rs:366-385) that the
  * HTTP layer renders as JSON columns tagged Dimension/Metric by
  * time-column membership (platform/src/event_segmentation.rs:80-92;
  * tagging rule event_segmentation.rs:136-162).
  *
  * Display values follow the reference's presentation rounding:
  * decimals shown with at most ROUND_DIGITS=3 digits, trailing zeros
  * trimmed (common/src/types.rs:17; funnel.rs:140-150).
  */
object Response {

  sealed trait ColumnKind
  case object Dimension extends ColumnKind
  case object Metric extends ColumnKind

  final case class ResponseColumn(name: String, kind: ColumnKind, values: Seq[String])
  final case class ColumnarTable(columns: Seq[ResponseColumn]) {
    def toJson: String = columns.map { c =>
      val vals = c.values.map(v =>
        if (v == null) "null" else "\"" + escape(v) + "\"")
        .mkString("[", ",", "]")
      s"""{"name":"${escape(c.name)}","kind":"${c.kind}","values":$vals}"""
    }.mkString("""{"columns":[""", ",", "]}")
  }

  /** Full JSON string escaping — backslash, quote, and all control
    * characters (U+0000–U+001F), per RFC 8259. */
  private[engine] def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Reference presentation rounding: ≤3 digits, trailing zeros
    * trimmed ("1.500" → "1.5", "2.000" → "2"). */
  private[engine] def formatNumber(d: Double): String = {
    val r = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val s = r.bigDecimal.stripTrailingZeros.toPlainString
    if (s == "-0") "0" else s
  }

  private def fmt(v: Any): String = v match {
    case null                => null
    case d: java.lang.Double => formatNumber(d)
    case f: java.lang.Float  => formatNumber(f.toDouble)
    case b: java.math.BigDecimal => formatNumber(b.doubleValue())
    case other               => other.toString
  }

  /** Collect a (small, post-aggregation) result into the columnar
    * response shape. `metricCols` default: numeric columns are
    * metrics, everything else a dimension — the reference tags by
    * time-column names; callers with pivoted output pass the bucket
    * column names explicitly. */
  def collect(df: DataFrame, metricCols: Seq[String] = Nil): ColumnarTable = {
    val rows = df.collect()
    val isMetric: String => Boolean =
      if (metricCols.nonEmpty) metricCols.contains
      else {
        val numeric = df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
        }.toSet
        numeric.contains
      }
    val cols = df.columns.zipWithIndex.map { case (name, i) =>
      ResponseColumn(name,
        if (isMetric(name)) Metric else Dimension,
        rows.toSeq.map(r => fmt(r.get(i))))
    }
    ColumnarTable(cols.toSeq)
  }
}
