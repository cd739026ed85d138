package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** LaTeX → plain text ("detex") for the arXiv-class corpus: a real
  * tokenizer over the public TeX surface syntax, not a regex soup —
  * comments, math spans, environments and balanced argument groups
  * need nesting awareness a single pattern cannot carry.
  *
  * Rules (each pinned by the gate's hand-derived fixtures):
  *  - `%` comments drop to end of line (`\%` is a literal percent);
  *    the `comment` environment drops whole.
  *  - Math is NOT text: `$...$`, `$$...$$`, `\(...\)`, `\[...\]` and
  *    the equation-class environments (equation/align/gather/
  *    multline/eqnarray/displaymath, starred or not) drop.
  *  - `verbatim`/`lstlisting` content copies RAW (it is code text);
  *    `tikzpicture` drops (it is drawing instructions).
  *  - Reference/markup commands drop WITH their argument: cite/ref/
  *    eqref/pageref/label/includegraphics/url/href(first arg)/input/
  *    include/usepackage/documentclass/bibliography(style)/vspace/
  *    hspace/newcommand/renewcommand; `\footnote{...}` drops whole
  *    (body text is the corpus — the house stance).
  *  - Sectioning commands keep their title and force a paragraph
  *    break around it; every other `\command` token drops while its
  *    braced groups stay transparent (so `\emph{x}` reads "x").
  *  - Escapes `\% \& \_ \# \$ \{ \}` are literals, `~` is a space,
  *    `\\` is a line break; the common accent commands compose with
  *    their letter and NFC-normalize (`\'e` → é, `\"o` → ö,
  *    `\c{c}` → ç).
  *  - Blank lines (and `\par`) are paragraph boundaries; whitespace
  *    collapses per the htmlToText conventions.
  */
object Latex {

  final case class LatexText(nParagraphs: Int, text: String)

  private val MathEnvs = Set("equation", "align", "gather", "multline",
    "eqnarray", "displaymath", "math",
    "equation*", "align*", "gather*", "multline*", "eqnarray*")
  private val DropEnvs = Set("tikzpicture", "comment")
  private val RawEnvs = Set("verbatim", "verbatim*", "lstlisting")
  /** Commands whose braced arguments vanish, with HOW MANY groups to
    * consume — macro definitions carry their replacement BODY as a
    * later group (`\newcommand{\x}[1]{body}` is two groups plus the
    * arg-count option), and leaking a body into the corpus is worse
    * than the command itself.
    */
  private val DropWithArg: Map[String, Int] = Map(
    "cite" -> 1, "citep" -> 1, "citet" -> 1, "ref" -> 1, "eqref" -> 1,
    "pageref" -> 1, "label" -> 1, "includegraphics" -> 1, "url" -> 1,
    "input" -> 1, "include" -> 1, "usepackage" -> 1,
    "documentclass" -> 1, "bibliography" -> 1, "bibliographystyle" -> 1,
    "vspace" -> 1, "hspace" -> 1, "pagestyle" -> 1,
    "thispagestyle" -> 1, "footnote" -> 1,
    "setlength" -> 2, "newcommand" -> 2, "renewcommand" -> 2,
    "providecommand" -> 2, "newenvironment" -> 3,
    "renewenvironment" -> 3)
  private val Sectioning = Set("part", "chapter", "section", "subsection",
    "subsubsection", "paragraph", "subparagraph", "title", "caption")
  private val Accents: Map[Char, Char] = Map(
    '\'' -> '\u0301', '`' -> '\u0300', '^' -> '\u0302',
    '"' -> '\u0308', '~' -> '\u0303', '=' -> '\u0304', '.' -> '\u0307')
  private val AccentWords: Map[String, Char] = Map(
    "c" -> '\u0327', "v" -> '\u030C', "u" -> '\u0306', "H" -> '\u030B')

  def extractText(src: String): LatexText = {
    if (src == null) return LatexText(0, "")
    val s = src.replace("\r\n", "\n").replace('\r', '\n')
    val out = new StringBuilder
    val n = s.length
    var i = 0

    def isLetter(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    // read a \command name starting AFTER the backslash
    def readWord(from: Int): Int = {
      var j = from
      while (j < n && isLetter(s.charAt(j))) j += 1
      if (j < n && s.charAt(j) == '*') j += 1
      j
    }

    // skip one balanced {...} group (returns index after it)
    def skipGroup(from: Int): Int = {
      var j = from
      while (j < n && (s.charAt(j) == ' ' || s.charAt(j) == '\n')) j += 1
      if (j >= n || s.charAt(j) != '{') return j
      var depth = 0
      while (j < n) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < n) j += 1
        else if (c == '{') depth += 1
        else if (c == '}') { depth -= 1; if (depth == 0) return j + 1 }
        j += 1
      }
      n
    }

    def skipOpt(from: Int): Int = {
      var j = from
      while (j < n && (s.charAt(j) == ' ')) j += 1
      if (j < n && s.charAt(j) == '[') {
        while (j < n && s.charAt(j) != ']') j += 1
        if (j < n) j += 1
        j
      } else from
    }

    // one TeX argument: a braced group, an unbraced control word
    // (\newcommand\foo{body}), or a single token
    def skipArg(from: Int): Int = {
      var j = from
      while (j < n && (s.charAt(j) == ' ' || s.charAt(j) == '\n')) j += 1
      if (j >= n) n
      else if (s.charAt(j) == '{') skipGroup(j)
      else if (s.charAt(j) == '\\') readWord(j + 1)
      else j + 1
    }

    // end of a $-delimited math span, honoring \$ escapes inside
    def mathEnd(from: Int, display: Boolean): Int = {
      var j = from
      while (j < n) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < n) j += 2
        else if (c == '$') {
          if (!display) return j + 1
          if (j + 1 < n && s.charAt(j + 1) == '$') return j + 2
          j += 1
        } else j += 1
      }
      n
    }

    // find \end{name} and return index after it (or n)
    def afterEnd(name: String, from: Int): Int = {
      val needle = "\\end{" + name + "}"
      val at = s.indexOf(needle, from)
      if (at < 0) n else at + needle.length
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '%') {
        while (i < n && s.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        // inline or display math: $...$ / $$...$$ — \$ inside the
        // span never terminates it
        val display = i + 1 < n && s.charAt(i + 1) == '$'
        i = mathEnd(i + (if (display) 2 else 1), display)
      } else if (c == '\\' && i + 1 < n) {
        val c1 = s.charAt(i + 1)
        if (c1 == '\\') {
          out.append('\n')
          // \\[5pt] spacing argument vanishes with the break
          i = skipOpt(i + 2)
        }
        else if ("%&_#${}".indexOf(c1) >= 0) { out.append(c1); i += 2 }
        else if (c1 == '[') { // display math \[...\]
          val close = s.indexOf("\\]", i + 2)
          i = if (close < 0) n else close + 2
        } else if (c1 == '(') {
          val close = s.indexOf("\\)", i + 2)
          i = if (close < 0) n else close + 2
        } else if (Accents.contains(c1)) {
          // \'e or \'{e}
          var j = i + 2
          var target = ' '
          if (j < n && s.charAt(j) == '{' && j + 1 < n) {
            target = s.charAt(j + 1); j = skipGroup(j)
          } else if (j < n) { target = s.charAt(j); j += 1 }
          if (isLetter(target)) {
            out.append(java.text.Normalizer.normalize(
              "" + target + Accents(c1), java.text.Normalizer.Form.NFC))
          }
          i = j
        } else if (isLetter(c1)) {
          val end = readWord(i + 1)
          val word = s.substring(i + 1, end)
          val bare = word.stripSuffix("*")
          i = end
          if (bare == "begin") {
            val gEnd = skipGroup(i)
            val env = s.substring(i, gEnd).stripPrefix("{").stripSuffix("}")
            i = skipOpt(gEnd)
            if (MathEnvs.contains(env) || DropEnvs.contains(env))
              i = afterEnd(env, i)
            else if (RawEnvs.contains(env)) {
              val stop = s.indexOf("\\end{" + env + "}", i)
              val e = if (stop < 0) n else stop
              out.append(s.substring(i, e))
              i = afterEnd(env, i)
            }
            // other environments: markers vanish, content flows
          } else if (bare == "end") {
            i = skipGroup(i)
          } else if (bare == "par") {
            out.append("\n\n")
          } else if (AccentWords.contains(word)) {
            // \c{c} style letter accents
            var j = i
            while (j < n && s.charAt(j) == ' ') j += 1
            if (j < n && s.charAt(j) == '{' && j + 1 < n &&
              isLetter(s.charAt(j + 1))) {
              out.append(java.text.Normalizer.normalize(
                "" + s.charAt(j + 1) + AccentWords(word),
                java.text.Normalizer.Form.NFC))
              i = skipGroup(j)
            }
          } else if (bare == "href") {
            // drop the URL argument, keep the display text transparent
            i = skipGroup(i)
          } else if (DropWithArg.contains(bare)) {
            // consume every declared argument, with option brackets
            // allowed between them; an argument may be a braced group
            // OR an unbraced control word (\newcommand\foo{body})
            var g = 0
            val groups = DropWithArg(bare)
            while (g < groups) {
              i = skipOpt(i)
              i = skipArg(i)
              g += 1
            }
          } else if (Sectioning.contains(bare)) {
            // paragraph break around the kept title; the group itself
            // is transparent, so just force the breaks
            i = skipOpt(i)
            out.append("\n\n")
            // title content flows through normal processing; append a
            // break AFTER the group by marking its extent
            val gEnd = skipGroup(i)
            if (gEnd > i) {
              val inner = s.substring(i, gEnd)
                .stripPrefix("{").stripSuffix("}")
              val t = extractText(inner).text
              out.append(t).append("\n\n")
              i = gEnd
            }
          } else {
            // unknown command: token drops, groups stay transparent;
            // eat ONE optional [..] so figure placements etc. vanish
            i = skipOpt(i)
            // a space after a command is a delimiter, not text
            if (i < n && s.charAt(i) == ' ') i += 1
          }
        } else {
          i += 2 // unknown control symbol drops
        }
      } else if (c == '{' || c == '}') {
        i += 1
      } else if (c == '~') {
        out.append(' '); i += 1
      } else {
        out.append(c); i += 1
      }
    }

    // whitespace discipline: collapse intra-line runs, blank lines
    // are paragraph boundaries
    val collapsed = out.toString
      .replaceAll("[ \\t]+", " ")
      .replaceAll(" ?\\n ?", "\n")
      .replaceAll("\\n{3,}", "\n\n")
      .replaceAll("\\A[\\n ]+|[\\n ]+\\z", "")
    val paras = collapsed.split("\\n{2,}").toSeq
      .map(_.trim).filter(_.nonEmpty)
    LatexText(paras.length, paras.mkString("\n"))
  }

  private val textUdf = udf { (src: String) =>
    Option(src).map(t => extractText(t).text)
  }

  /** Plain text as a string column; NULL propagates. */
  def textCol(srcCol: Column): Column = textUdf(srcCol)
}
