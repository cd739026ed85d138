package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** MediaWiki wikitext → plain text, for the Wikipedia-dump corpus
  * (the de-facto standard first stop of every public LLM data
  * pipeline). Like [[Latex]] this is a real tokenizer, not a regex
  * soup: templates and link targets NEST (`{{cite |date={{today}}}}`,
  * `[[File:x|thumb|a [[link]] in the caption]]`), which only a stack
  * can carry.
  *
  * Rules (each pinned by the gate's hand-derived fixtures):
  *  - `<!-- comments -->` and `<ref>...</ref>` / `<ref ... />` drop
  *    (citations are markup, not prose).
  *  - `{{templates}}` drop whole at any nesting depth — infoboxes,
  *    citations and navboxes are structured data, not body text.
  *  - `{| tables |}` drop whole (nested included).
  *  - `[[File:...]]` / `[[Image:...]]` / `[[Category:...]]` drop
  *    whole including nested caption links; `[[target|label]]` reads
  *    "label", `[[target]]` reads "target".
  *  - `[http://url label]` reads "label"; a bare `[http://url]`
  *    drops.
  *  - Bold/italic quote runs (`'''''`, `'''`, `''`) drop.
  *  - `== Heading ==` lines read as their own paragraph; list
  *    markers (`*`, `#`, `:`, `;`) strip; `----` rules drop.
  *  - Remaining HTML tags strip to a space, entities decode,
  *    whitespace collapses with blank-line paragraph boundaries (the
  *    [[Latex]] discipline).
  */
object Wikitext {

  final case class WikiText(nParagraphs: Int, text: String)

  private val HeadingLine = "^\\s*(={1,6})\\s*(.*?)\\s*\\1\\s*$".r
  private val RuleLine = java.util.regex.Pattern.compile("^\\s*-{4,}\\s*$")
  private val ListMarker = java.util.regex.Pattern.compile("^[*#:;]+\\s*")

  def extractText(src: String): WikiText = {
    if (src == null) return WikiText(0, "")
    var s = src.replace("\r\n", "\n").replace('\r', '\n')
    s = s.replaceAll("(?s)<!--.*?-->", "")
    // self-closed first: [^>]* (NOT [^>/]*) so a '/' inside an
    // attribute value ('name="a/b"') still matches — otherwise the
    // paired-form regex below would swallow prose up to the next
    // </ref>
    s = s.replaceAll("(?is)<ref\\b[^>]*/>", "")
    s = s.replaceAll("(?is)<ref\\b[^>]*>.*?</ref>", "")
    // templates AND template parameters in one run-aware pass — fixed
    // two- or three-char openers mis-pair the 4- and 5-brace runs of
    // nested/meta-template markup ({{{{foo}}}}, {{{{{1}}}}}) and leak
    // close braces
    s = dropBraceRuns(s)
    s = dropNested(s, "{|", "|}")
    s = resolveLinks(s)
    // external links: [url label] → label; [url] → drop
    s = s.replaceAll("\\[\\s*[a-z][a-z0-9+.-]*://\\S*\\s+([^\\]]+)\\]", "$1")
    s = s.replaceAll("\\[\\s*[a-z][a-z0-9+.-]*://[^\\]]*\\]", "")
    // bold/italic quote runs (longest first)
    s = s.replace("'''''", "").replace("'''", "").replace("''", "")
    // line-level forms (patterns hoisted — this is the per-row hot
    // loop of a dump-sized corpus)
    val lines = s.split("\n", -1).map { t =>
      t match {
        case HeadingLine(_, title) => "\n" + title + "\n" // own paragraph
        case _ if RuleLine.matcher(t).matches() => ""
        case _ => ListMarker.matcher(t).replaceFirst("")
      }
    }
    s = lines.mkString("\n")
    // leftover tags and entities (the htmlToText conventions)
    s = s.replaceAll("<[^>]*>", " ")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    val collapsed = s
      .replaceAll("[ \\t]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .replaceAll("\\A[\\n ]+|[\\n ]+\\z", "")
    val paras = collapsed.split("\\n{2,}").toSeq
      .map(_.trim).filter(_.nonEmpty)
    WikiText(paras.length, paras.mkString("\n"))
  }

  /** Drop every `{{`-or-longer brace construct: an opener is a
    * MAXIMAL run of 2+ '{' (its length pushed on a stack), a closer
    * run of 2+ '}' pays down the stack run by run — so templates
    * (`{{..}}`), parameters (`{{{..}}}`) and the glued 4-/5-brace
    * forms of meta-template markup all balance without leaking
    * braces. Single braces are literal text at depth 0; anything
    * still open at end of input was torn and stays dropped (markup
    * never leaks into the corpus).
    */
  private def dropBraceRuns(s: String): String = {
    val out = new StringBuilder
    val stack = scala.collection.mutable.Stack.empty[Int]
    var i = 0
    val n = s.length
    def runLen(c: Char): Int = {
      var j = i
      while (j < n && s.charAt(j) == c) j += 1
      j - i
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '{' && runLen('{') >= 2) {
        val r = runLen('{')
        stack.push(r)
        i += r
      } else if (c == '}' && stack.nonEmpty && runLen('}') >= 2) {
        var r = runLen('}')
        i += r
        while (r >= 2 && stack.nonEmpty) {
          val open = stack.pop()
          if (open > r) { stack.push(open - r); r = 0 }
          else r -= open
        }
        // a leftover single '}' from an odd run is markup residue —
        // dropped with its construct
      } else {
        if (stack.isEmpty) out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Drop `open`..`close` spans at any nesting depth; an unclosed
    * open drops to end of input (torn posture: markup never leaks
    * into the corpus).
    */
  private def dropNested(s: String, open: String, close: String): String = {
    val out = new StringBuilder
    var i = 0
    var depth = 0
    val n = s.length
    while (i < n) {
      if (s.startsWith(open, i)) { depth += 1; i += open.length }
      else if (depth > 0 && s.startsWith(close, i)) {
        depth -= 1; i += close.length
      } else {
        if (depth == 0) out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  private val DropPrefixes =
    Seq("file:", "image:", "category:", "media:")

  /** `[[...]]` with nesting: drop File/Image/Category whole, keep
    * label (after the LAST pipe at depth 1) otherwise.
    */
  private def resolveLinks(s: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.startsWith("[[", i)) {
        // find the matching ]] with nesting
        var j = i + 2
        var depth = 1
        while (j < n && depth > 0) {
          if (s.startsWith("[[", j)) { depth += 1; j += 2 }
          else if (s.startsWith("]]", j)) { depth -= 1; j += 2 }
          else j += 1
        }
        val inner = s.substring(i + 2, math.max(i + 2, j - 2))
        val lower = inner.toLowerCase
        // a torn link drops whole (markup never leaks, the template
        // posture)
        if (depth == 0 && !DropPrefixes.exists(lower.startsWith)) {
          // label = after the last TOP-LEVEL pipe
          var k = 0
          var d = 0
          var lastPipe = -1
          while (k < inner.length) {
            if (inner.startsWith("[[", k)) { d += 1; k += 2 }
            else if (inner.startsWith("]]", k)) { d -= 1; k += 2 }
            else {
              if (d == 0 && inner.charAt(k) == '|') lastPipe = k
              k += 1
            }
          }
          val label = if (lastPipe >= 0) inner.substring(lastPipe + 1) else inner
          // nested links inside a kept label resolve recursively
          out.append(resolveLinks(label))
        }
        i = j
      } else {
        out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  private val textUdf = udf { (src: String) =>
    Option(src).map(t => extractText(t).text)
  }

  /** Plain text as a string column; NULL propagates. */
  def textCol(srcCol: Column): Column = textUdf(srcCol)
}
