package graft.engine.read

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RTF (Rich Text Format, Word RTF spec 1.9.1) text extraction — the
  * fifth crawl document format, and the one that needs no container
  * at all: an RTF file is a 7-bit ASCII token stream of `{` `}`
  * groups and `\controlword` tokens, so the whole parse is
  * offline-verifiable against the published grammar.
  *
  * The walk keeps a group stack carrying the two pieces of inherited
  * state that affect TEXT (the `\ucN` unicode-skip count and
  * destination-skip status) and emits:
  *  - plain text runs verbatim,
  *  - `\par` as paragraph breaks, `\line` as '\n', `\tab` as '\t',
  *  - `\uN` as the BMP char (negative N wraps per spec: N+65536),
  *    consuming the following `uc` fallback characters,
  *  - `\'xx` hex escapes through the declared ANSI code page
  *    (`\ansicpgN`, default windows-1252) using the JVM's OWN charset
  *    tables — nothing transcribed,
  *  - the symbol escapes `\\ \{ \}`, `\~` (nbsp), `\_`, `\-` (soft
  *    hyphen drops), and the common typographic words (dashes,
  *    quotes, bullet) at their Unicode code points.
  *
  * Non-text destinations are skipped as whole groups: the header
  * tables (`\fonttbl \colortbl \stylesheet \info`), embedded objects
  * (`\pict \object`), page furniture (`\header* \footer*`), notes
  * (`\footnote` — body text is the corpus, the Odt/Docx stance), and
  * every UNKNOWN `{\*...}` ignorable destination, exactly as the spec
  * instructs readers that don't understand a destination. `\binN`
  * payloads are skipped byte-exact so binary data can never alias as
  * control text.
  *
  * Truncated documents extract what is physically present (the crawl
  * posture — a torn tail loses its trailing run, never the document);
  * None only for payloads that don't open with the `{\rtf` magic.
  */
object Rtf {

  final case class RtfText(nParagraphs: Int, text: String)

  /** Destination control words whose whole group is non-text. */
  private val SkipDestinations: Set[String] = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "ftnsep",
    "ftnsepc", "xe", "tc", "fldinst", "themedata",
    "colorschememapping", "datastore", "latentstyles", "listtable",
    "listoverridetable", "revtbl", "generator", "background",
    "docvar", "operator", "creatim", "revtim", "printim", "buptim",
    "comment", "doccomm", "atnid", "annotation")

  /** Control words that expand to a fixed character (spec appendix). */
  private val SymbolWords: Map[String, Char] = Map(
    "line" -> '\n', "tab" -> '\t',
    "emdash" -> '—', "endash" -> '–',
    "lquote" -> '‘', "rquote" -> '’',
    "ldblquote" -> '“', "rdblquote" -> '”',
    "bullet" -> '•', "emspace" -> ' ',
    "enspace" -> ' ', "qmspace" -> ' ')
  // \~ and \_ are control SYMBOLS (the next char is not a letter),
  // handled in the control-symbol branch - never looked up here.

  /** The `{\info{\title …}}` document title — metadata the body walk
    * deliberately skips (info is a non-text destination). Plain text
    * with `\{ \} \\` escapes and `\'xx` code-page bytes; other
    * control words inside the title group drop. None when absent.
    */
  def docTitle(bytes: Array[Byte]): Option[String] =
    infoField(bytes, "title")

  /** The `{\info{\author …}}` author, same scanner. */
  def docAuthor(bytes: Array[Byte]): Option[String] =
    infoField(bytes, "author")

  private def infoField(bytes: Array[Byte], field: String): Option[String] = {
    if (bytes == null || bytes.length < 6) return None
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return None
    val info = s.indexOf("{\\info")
    if (info < 0) return None
    val at = s.indexOf("{\\" + field, info)
    if (at < 0) return None
    val cs = """\\ansicpg(\d+)""".r.findFirstMatchIn(s)
      .flatMap(m => charsetFor(m.group(1).toInt))
      .getOrElse(java.nio.charset.StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    var i = at + 2 + field.length // past "{\" + the control word
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; i += 1
        case '\\' if i + 1 < s.length =>
          val c1 = s.charAt(i + 1)
          if (c1 == '{' || c1 == '}' || c1 == '\\') { sb.append(c1); i += 2 }
          else if (c1 == '\'' && i + 3 < s.length) {
            try sb.append(new String(
              Array(Integer.parseInt(s.substring(i + 2, i + 4), 16).toByte), cs))
            catch { case _: NumberFormatException => () }
            i += 4
          } else {
            // control word: skip letters + optional numeric + 1 space
            var j = i + 1
            while (j < s.length && s.charAt(j).isLetter) j += 1
            if (j < s.length && (s.charAt(j) == '-' || s.charAt(j).isDigit)) {
              if (s.charAt(j) == '-') j += 1
              while (j < s.length && s.charAt(j).isDigit) j += 1
            }
            if (j < s.length && s.charAt(j) == ' ') j += 1
            i = math.max(j, i + 2)
          }
        case c => sb.append(c); i += 1
      }
    }
    Some(sb.toString.trim).filter(_.nonEmpty)
  }

  def extractText(bytes: Array[Byte]): Option[RtfText] = {
    if (bytes == null || bytes.length < 6) return None
    // ISO-8859-1 maps bytes 1:1 to chars, so \'xx re-encodes exactly
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("{\\rtf")) return None

    var codepage: java.nio.charset.Charset =
      charsetFor(1252).getOrElse(java.nio.charset.StandardCharsets.ISO_8859_1)

    // group-inherited state
    final case class GState(uc: Int, skip: Boolean)
    var st = GState(uc = 1, skip = false)
    val stack = scala.collection.mutable.Stack.empty[GState]

    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flushPara(): Unit = { paras += cur.toString; cur.clear() }

    var i = 0
    val n = s.length
    // after \uN, this many fallback chars/escapes are consumed
    var pendingUcSkip = 0

    def emit(c: Char): Unit =
      if (!st.skip) {
        if (pendingUcSkip > 0) pendingUcSkip -= 1
        else cur.append(c)
      }

    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '{' =>
          stack.push(st)
          // a fresh group starts a fresh uc-skip scope but inherits both
          i += 1
        case '}' =>
          if (stack.nonEmpty) st = stack.pop()
          pendingUcSkip = 0
          i += 1
        case '\\' if i + 1 < n =>
          val c1 = s.charAt(i + 1)
          if (c1 == '\'') {
            // \'xx — one byte in the declared code page
            if (i + 3 < n) {
              val hex = s.substring(i + 2, i + 4)
              val b = try Integer.parseInt(hex, 16)
              catch { case _: NumberFormatException => -1 }
              if (b >= 0) {
                val decoded = new String(Array(b.toByte), codepage)
                if (!st.skip) {
                  if (pendingUcSkip > 0) pendingUcSkip -= 1
                  else cur.append(decoded)
                }
                i += 4
              } else i += 2
            } else i = n
          } else if (c1.isLetter) {
            // control word: letters, optional signed numeric parameter,
            // one optional space delimiter (consumed)
            var j = i + 1
            while (j < n && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var param: Option[Long] = None
            if (j < n && (s.charAt(j) == '-' || s.charAt(j).isDigit)) {
              val k0 = j
              if (s.charAt(j) == '-') j += 1
              while (j < n && s.charAt(j).isDigit) j += 1
              // a parameter too large for Long is hostile; saturate
              // rather than silently reading as 0 (\binN must NEVER
              // under-skip its payload)
              param = Some(scala.util.Try(s.substring(k0, j).toLong)
                .getOrElse(if (s.charAt(k0) == '-') Long.MinValue
                else Long.MaxValue))
            }
            if (j < n && s.charAt(j) == ' ') j += 1
            i = j
            word match {
              case "par" | "sect" | "page" =>
                if (!st.skip) flushPara()
              case "cell" | "row" =>
                // table cell/row ends read as paragraph breaks
                if (!st.skip) flushPara()
              case "uc" =>
                st = st.copy(uc =
                  param.getOrElse(1L).max(0).min(65535).toInt)
              case "u" =>
                val code = param.getOrElse(0L)
                val cp = if (code < 0) code + 65536 else code
                if (!st.skip && pendingUcSkip == 0 &&
                  cp >= 0 && cp <= 0xFFFF) cur.append(cp.toChar)
                if (pendingUcSkip > 0) pendingUcSkip -= 1
                else pendingUcSkip = st.uc
              case "ansicpg" =>
                param.filter(p => p > 0 && p <= Int.MaxValue)
                  .flatMap(p => charsetFor(p.toInt))
                  .foreach(codepage = _)
              case "bin" =>
                // raw byte payload — skip byte-exact (an oversized or
                // overflowed N skips to end of input: binary must
                // never alias as control text). Compare, don't add:
                // i + Long.MaxValue would wrap negative.
                val skip = param.getOrElse(0L).max(0)
                i = if (skip >= (n - i).toLong) n else i + skip.toInt
              case w if SkipDestinations.contains(w) =>
                st = st.copy(skip = true)
              case w if SymbolWords.contains(w) =>
                emit(SymbolWords(w))
              case _ => () // formatting word — no text effect
            }
          } else {
            // control symbol: one char
            c1 match {
              case '\\' | '{' | '}' => emit(c1)
              case '~'              => emit(' ')
              case '_'              => emit('‑')
              case '-'              => () // optional hyphen — drops
              case '*' =>
                // {\* ...}: ignorable destination — skip unless the
                // NEXT word is one we'd read anyway (none emit text,
                // so skip the group)
                st = st.copy(skip = true)
              case '\n' | '\r'      => () // escaped newline = \par in
                                          // old writers; treat as break
              case _                => ()
            }
            if (c1 == '\n' || c1 == '\r') { if (!st.skip) flushPara() }
            i += 2
          }
        case '\r' | '\n' =>
          i += 1 // raw newlines are not text in RTF
        case other =>
          emit(other)
          i += 1
      }
    }
    if (cur.nonEmpty) flushPara()
    // drop trailing empty paragraphs (a final \par is a terminator,
    // not a blank line)
    while (paras.nonEmpty && paras.last.isEmpty) paras.remove(paras.length - 1)
    Some(RtfText(paras.length, paras.mkString("\n")))
  }

  private def charsetFor(cpg: Int): Option[java.nio.charset.Charset] =
    try {
      val name = cpg match {
        case 65001 => "UTF-8"
        case 10000 => "x-MacRoman"
        case other => s"windows-$other"
      }
      if (java.nio.charset.Charset.isSupported(name))
        Some(java.nio.charset.Charset.forName(name))
      else None
    } catch { case _: Exception => None }

  private val textUdf = udf { (bytes: Array[Byte]) =>
    extractText(bytes).map(_.text)
  }

  /** Body text as a string column; NULL when unreadable. */
  def textCol(bytesCol: Column): Column = textUdf(bytesCol)
}
