package graft.engine.read

import org.scalatest.funsuite.AnyFunSuite

/** Notebooks against hand-authored nbformat JSON: authored cell text
  * extracts in order, outputs drop, v3 worksheets read, JSON configs
  * that merely mention nbformat stay txt.
  */
class IpynbSpec extends AnyFunSuite {

  private val v4 =
    """{
      | "nbformat": 4, "nbformat_minor": 5,
      | "metadata": {"kernelspec": {"language": "python"}},
      | "cells": [
      |  {"cell_type": "markdown", "metadata": {},
      |   "source": ["# Title\n", "prose line\n"]},
      |  {"cell_type": "code", "metadata": {}, "execution_count": 1,
      |   "source": "print('hello')\n",
      |   "outputs": [{"output_type": "stream",
      |     "text": ["NEVER THIS\n"]},
      |    {"output_type": "display_data", "data":
      |     {"image/png": "aWdub3JlZA=="}}]},
      |  {"cell_type": "raw", "metadata": {}, "source": ["raw block"]},
      |  {"cell_type": "code", "metadata": {}, "source": []}
      | ]
      |}""".stripMargin

  test("nbformat 4: authored sources in order, outputs drop") {
    val t = Ipynb.extractText(v4).get
    assert(t.nCells == 3) // the empty code cell contributes nothing
    assert(t.text == "# Title\nprose line\n\nprint('hello')\n\nraw block")
    assert(!t.text.contains("NEVER THIS") && !t.text.contains("aWdub3JlZA"))
  }

  test("nbformat 3 worksheets read; code cells use `input`") {
    val v3 =
      """{"nbformat": 3, "worksheets": [{"cells": [
        | {"cell_type": "markdown", "source": ["legacy prose"]},
        | {"cell_type": "code", "input": ["x = 1\n", "print(x)"],
        |  "outputs": [{"text": ["1"]}]}
        |]}]}""".stripMargin
    val t = Ipynb.extractText(v3).get
    assert(t.text == "legacy prose\n\nx = 1\nprint(x)")
  }

  test("the probe upgrades notebooks from txt; configs stay txt") {
    val b = v4.getBytes("UTF-8")
    assert(DocumentProbe.probe(b).exists(m =>
      m.format == "ipynb" && m.units == 3))
    assert(DocumentProbe.extractText(b).exists(_.startsWith("# Title")))
    val inv = DocumentProbe.inventory(b)
    assert(inv.format.contains("ipynb") &&
      inv.text.exists(_.contains("print('hello')")))
    // a config that merely MENTIONS the keys is not a notebook
    val config = """{"nbformat": "see docs", "cells": "none"}"""
    assert(DocumentProbe.probe(config.getBytes("UTF-8"))
      .exists(_.format == "txt"))
    // ... and one with cells present but nbformat non-numeric too
    val odd = """{"nbformat": [], "cells": []}"""
    assert(DocumentProbe.probe(odd.getBytes("UTF-8"))
      .exists(_.format == "txt"))
  }

  test("a latex-looking cell still routes as a notebook (order pin)") {
    val nb = ("""{"nbformat": 4, "cells": [{"cell_type": "markdown",""" +
      """ "source": ["\\documentclass{article} in prose"]}]}""")
      .getBytes("UTF-8")
    assert(DocumentProbe.probe(nb).exists(_.format == "ipynb"))
  }

  test("hostility: torn/junk/null never throw") {
    assert(Ipynb.extractText("{\"nbformat\": 4, \"cells\": [").isEmpty)
    assert(Ipynb.extractText("not json").isEmpty)
    assert(Ipynb.extractText(null: String).isEmpty)
    assert(Ipynb.extractText(null: Array[Byte]).isEmpty)
    assert(Ipynb.extractText("{\"nbformat\": 99, \"cells\": []}")
      .isEmpty == false) // future versions read like v4
  }

  test("ipynb_text SQL function surfaces the kernel") {
    val spark = graft.SparkSpec.session
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, v4.getBytes("UTF-8")), (2L, Array[Byte](0, 1)))
      .toDF("id", "content").createOrReplaceTempView("nbs")
    val got = spark.sql(
      "SELECT id, ipynb_text(content) AS t FROM nbs ORDER BY id").collect()
    assert(got(0).getString(1).startsWith("# Title"))
    assert(got(1).isNullAt(1))
  }
}
