package graft.extraction

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A stored high-water mark for one source (ref extraction/watermark.py:21). */
final case class Watermark(source: String, column: String, value: String)

/** Watermark store for incremental extraction
  * (ref extraction/watermark.py:70-260).
  *
  * In-memory map with optional JSON-file persistence — the driver-side
  * metadata is a handful of (source, column, value) triples, never data-
  * sized. [[updateFromDataFrame]] is the only Spark interaction: a
  * single-row `max` aggregate (the one legitimate driver-side read in
  * this library — a scalar, not a dataset).
  */
final class WatermarkManager(persistPath: Option[Path] = None) {

  private var marks: Map[String, Watermark] = persistPath match {
    case Some(p) if Files.exists(p) => WatermarkManager.parse(Files.readString(p))
    case _                          => Map.empty
  }

  def get(source: String): Option[Watermark] = marks.get(source)
  def getValue(source: String): Option[String] = marks.get(source).map(_.value)
  def listSources: Seq[String] = marks.keys.toSeq.sorted

  def set(source: String, column: String, value: String): Unit = {
    marks = marks.updated(source, Watermark(source, column, value))
    save()
  }

  def delete(source: String): Boolean = {
    val had = marks.contains(source)
    marks = marks.removed(source)
    save()
    had
  }

  /** watermark.py:189 `update_from_dataframe`: advance to max(column). */
  def updateFromDataFrame(df: DataFrame, source: String, column: String): Option[String] = {
    val row = df.agg(max(col(column)).cast("string")).head()
    Option(row.getString(0)).map { v => set(source, column, v); v }
  }

  private def save(): Unit = persistPath.foreach { p =>
    Files.write(p, WatermarkManager.render(marks).getBytes(StandardCharsets.UTF_8))
  }
}

object WatermarkManager {
  private def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  private[extraction] def render(marks: Map[String, Watermark]): String =
    marks.values.toSeq.sortBy(_.source).map { w =>
      s"""{"source":"${esc(w.source)}","column":"${esc(w.column)}","value":"${esc(w.value)}"}"""
    }.mkString("[", ",", "]")

  /** Exact inverse of [[esc]]: one left-to-right scan, so a literal
    * backslash-n two-char sequence (escaped as `\\n`) round-trips as
    * backslash+n instead of collapsing into a newline, and `\uXXXX`
    * control-char escapes decode. */
  private[extraction] def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'                       => sb += '\n'; i += 2
          case 'u' if i + 6 <= s.length  =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other                     => sb += other; i += 2 // covers \" and \\
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Minimal parser for the flat array [[render]] writes (no nesting,
    * all fields strings) — avoids a JSON dependency the sandbox lacks. */
  private[extraction] def parse(json: String): Map[String, Watermark] = {
    val field = (name: String, obj: String) => {
      val m = ("\"" + name + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(obj)
      m.map(g => unesc(g.group(1)))
    }
    "\\{[^{}]*\\}".r.findAllIn(json).flatMap { obj =>
      for (s <- field("source", obj); c <- field("column", obj); v <- field("value", obj))
        yield s -> Watermark(s, c, v)
    }.toMap
  }
}
