package graft.engine.read

/** Jupyter notebook (`.ipynb`) text extraction — a dominant member
  * of every code-corpus crawl (GitHub alone hosts tens of millions),
  * and as raw bytes a notebook is JSON: routed as `txt` it pollutes
  * the text layer with brackets and base64 output blobs instead of
  * the authored content. The public nbformat schema
  * (nbformat.readthedocs.io) is small:
  *
  *  - v4: top-level `cells`, each `{cell_type, source, ...}` with
  *    `source` a string OR a list of line strings;
  *  - v3: `worksheets[].cells`, code cells carry `input` instead of
  *    `source`;
  *  - AUTHORED text = markdown/raw/heading cell sources and code
  *    cell sources; OUTPUTS drop (execution artifacts — the
  *    base64 images and reprs that make naive JSON-as-text so bad).
  *
  * Cells join with a blank line (the rendered-document reading
  * order). Parsing is json4s (Spark's own classpath); anything that
  * does not parse as a notebook-shaped object is not a notebook —
  * the caller keeps its txt routing, so a JSON config file never
  * vanishes.
  */
object Ipynb {

  final case class NotebookText(nCells: Int, text: String)

  import org.json4s._

  /** Cheap head gate before the full parse: a JSON object that
    * mentions both nbformat and cell containers.
    */
  def looksNotebook(s: String): Boolean = {
    var i = 0
    while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    i < s.length && s.charAt(i) == '{' &&
      s.contains("\"nbformat\"") &&
      (s.contains("\"cells\"") || s.contains("\"worksheets\""))
  }

  private def sourceText(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JArray(items) =>
      Some(items.collect { case JString(s) => s }.mkString)
    case _ => None
  }

  private def cellText(cell: JValue): Option[String] = cell match {
    case obj: JObject =>
      val kind = (obj \ "cell_type") match {
        case JString(k) => k
        case _          => return None
      }
      kind match {
        case "markdown" | "raw" | "heading" => sourceText(obj \ "source")
        case "code" =>
          // v4 uses `source`, v3 `input`; outputs stay dropped
          sourceText(obj \ "source").orElse(sourceText(obj \ "input"))
        case _ => None
      }
    case _ => None
  }

  /** Authored cell text in document order; None when not a parseable
    * notebook.
    */
  def extractText(src: String): Option[NotebookText] = try {
    if (src == null || !looksNotebook(src)) return None
    val json = org.json4s.jackson.JsonMethods.parse(src)
    val nbformat = (json \ "nbformat") match {
      case JInt(n)    => n.toInt
      case JDouble(d) => d.toInt
      case _          => return None
    }
    val cells: Seq[JValue] = nbformat match {
      case n if n >= 4 => (json \ "cells") match {
        case JArray(items) => items
        case _             => return None
      }
      case 3 => (json \ "worksheets") match {
        case JArray(ws) => ws.flatMap(w => (w \ "cells") match {
          case JArray(items) => items
          case _             => Seq.empty
        })
        case _ => return None
      }
      case _ => return None
    }
    val texts = cells.flatMap(cellText)
      .map(_.replaceAll("\\s+\\z", "")).filter(_.nonEmpty)
    Some(NotebookText(texts.length, texts.mkString("\n\n")))
  } catch { case _: Exception => None }

  def extractText(bytes: Array[Byte]): Option[NotebookText] = {
    if (bytes == null) return None
    val s = try new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    catch { case _: Exception => return None }
    extractText(s)
  }

  private val textUdf = org.apache.spark.sql.functions.udf {
    (bytes: Array[Byte]) => extractText(bytes).map(_.text)
  }

  /** Authored notebook text as a column; NULL when not a notebook. */
  def textCol(bytesCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textUdf(bytesCol)
}
