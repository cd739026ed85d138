package graft.ops

class LatexSpec extends graft.SparkSpec {

  private def t(src: String): String = Latex.extractText(src).text

  test("commands drop, groups stay transparent, comments vanish") {
    val src = "\\documentclass{article}\n\\begin{document}\n" +
      "\\section{Intro}\nHello \\emph{world}~here. % comment\n" +
      "Math $x+y$ drops.\n\n\\par Done.\n\\end{document}\n"
    val got = Latex.extractText(src)
    assert(got.text == "Intro\nHello world here.\nMath drops.\nDone.")
    // "Hello ... / Math drops." share a paragraph (single newline)
    assert(got.nParagraphs == 3)
  }

  test("math environments drop, verbatim copies raw, accents compose") {
    val src = "Caf\\'e costs 5~EUR.\n\\begin{equation}\nE=mc^2\n" +
      "\\end{equation}\nAfter \\begin{itemize}\\item one \\item two" +
      "\\end{itemize} list.\n\\begin{verbatim}\nraw <code> $x$\n" +
      "\\end{verbatim}\nEnd."
    assert(t(src) ==
      "Café costs 5 EUR.\nAfter one two list.\nraw <code> $x$\nEnd.")
  }

  test("refs and footnotes drop with args; href keeps display text") {
    val src = "See~\\cite{x2020} and \\ref{fig:1}.\\footnote{drop me} " +
      "Also \\href{http://x}{link text} and \\url{http://y} end."
    assert(t(src) == "See and . Also link text and end.")
  }

  test("escaped percent, forced line breaks, comment and starred envs") {
    val src = "A 50\\% share.\\\\Line two.\n\\begin{comment}\nhidden\n" +
      "\\end{comment}\n\\begin{align*}\nx &= y\n\\end{align*}\nTail."
    val got = Latex.extractText(src)
    assert(got.text == "A 50% share.\nLine two.\nTail.")
    assert(got.nParagraphs == 2)
  }

  test("display math forms and special escapes") {
    assert(t("a \\[ x=1 \\] b \\( y \\) c") == "a b c")
    assert(t("50\\$ \\& \\_ \\# \\{x\\}") == "50$ & _ # {x}")
    assert(t("x $$ E=mc^2 $$ y") == "x y")
  }

  test("accent command forms") {
    assert(t("\\'e \\`a \\^o \\\"u \\~n") == "é à ô ü ñ")
    assert(t("\\c{c}a \\v{s} \\'{E}") == "ça š É")
  }

  test("caption text is kept with paragraph breaks, graphics drop") {
    val src = "\\begin{figure}[h]\\includegraphics[width=5cm]{img.png}" +
      "\\caption{A nice plot}\\label{fig:x}\\end{figure}Body."
    assert(t(src) == "A nice plot\nBody.")
  }

  test("macro definitions drop their bodies, not just their names") {
    assert(t("\\newcommand{\\greet}[1]{Hello #1}After.") == "After.")
    assert(t("\\renewcommand{\\x}{body}Kept.") == "Kept.")
    assert(t("\\setlength{\\parindent}{1cm}Kept.") == "Kept.")
    assert(t("\\newenvironment{env}[1]{pre #1}{post}Kept.") == "Kept.")
  }

  test("unbraced macro names, spacing breaks and escaped dollars in math") {
    // the first \newcommand argument may be an unbraced control word
    assert(t("\\newcommand\\etal{et al.}After.") == "After.")
    // \\[5pt] spacing vanishes with the break
    assert(t("first \\\\[2ex] second") == "first\nsecond")
    // \$ inside a math span never terminates it
    assert(t("$cost = \\$5$ remains.") == "remains.")
  }

  test("latex_to_text SQL function surfaces the kernel") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, "x \\emph{via} $m$ sql"), (2L, null.asInstanceOf[String]))
      .toDF("id", "src").createOrReplaceTempView("latex_docs")
    val got = spark.sql(
      "SELECT id, latex_to_text(src) AS t FROM latex_docs ORDER BY id")
      .collect()
    assert(got(0).getString(1) == "x via sql")
    assert(got(1).isNullAt(1))
  }

  test("hostile inputs never throw") {
    assert(t(null) == "")
    assert(t("") == "")
    assert(t("unterminated $ math") == "unterminated")
    assert(t("\\begin{equation} never ends") == "")
    assert(t("{unbalanced {groups") == "unbalanced groups")
    assert(t("\\") == "\\")
  }
}
