package graft.engine.validate

import org.apache.spark.sql.functions._

import graft.engine.{ValidationContext, ValidationResult, Validator}

/** Pascal VOC annotation XML validation (SURVEY.md §2.3 V11,
  * `xml_validator.py:22-643`): per file — root element `annotation`,
  * required structural elements, positive integer geometry,
  * xmin<xmax / ymin<ymax, area>0 (warn <10), `difficult` ∈ {0,1} (warn
  * outside). Parsing runs in executors (scala.xml over binaryFile
  * content); only the per-file error strings travel to the driver.
  */
object XmlValidators {

  final case class VocIssues(errors: List[String], warnings: List[String])

  /** Pure per-file check — unit-testable without Spark. */
  def checkVocXml(name: String, xmlText: String): VocIssues = {
    import scala.xml.XML
    val root =
      try XML.loadString(xmlText)
      catch {
        case e: Exception =>
          return VocIssues(List(s"$name: not parseable XML (${e.getMessage})"), Nil)
      }
    if (root.label != "annotation")
      return VocIssues(List(s"$name: root element is '${root.label}', expected 'annotation'"), Nil)

    val errs = List.newBuilder[String]
    val warns = List.newBuilder[String]
    for (req <- Seq("folder", "filename", "source", "size", "segmented"))
      if ((root \ req).isEmpty) errs += s"$name: missing required element <$req>"
    for (dim <- Seq("width", "height", "depth")) {
      val t = (root \ "size" \ dim).text.trim
      if (t.isEmpty) errs += s"$name: missing <size>/<$dim>"
      else t.toIntOption match {
        case Some(v) if v > 0 => ()
        case Some(v) => errs += s"$name: <size>/<$dim> must be positive, got $v"
        case None => errs += s"$name: <size>/<$dim> is not an integer: '$t'"
      }
    }
    val objects = root \ "object"
    if (objects.isEmpty) warns += s"$name: no <object> elements"
    objects.zipWithIndex.foreach { case (obj, i) =>
      val tag = s"$name object[$i]"
      for (req <- Seq("name", "pose", "truncated", "difficult", "bndbox"))
        if ((obj \ req).isEmpty) errs += s"$tag: missing <$req>"
      val difficult = (obj \ "difficult").text.trim.toIntOption
      difficult match {
        case Some(v) if v < 0 => errs += s"$tag: <difficult> must be >= 0, got $v"
        case Some(v) if v > 1 => warns += s"$tag: <difficult> outside {0,1}: $v"
        case _ => ()
      }
      val box = obj \ "bndbox"
      if (box.nonEmpty) {
        def coord(n: String): Option[Int] = (box \ n).text.trim.toIntOption
        (coord("xmin"), coord("ymin"), coord("xmax"), coord("ymax")) match {
          case (Some(x1), Some(y1), Some(x2), Some(y2)) =>
            if (Seq(x1, y1, x2, y2).exists(_ < 0))
              errs += s"$tag: negative bndbox coordinate"
            if (x1 >= x2) errs += s"$tag: xmin ($x1) must be < xmax ($x2)"
            if (y1 >= y2) errs += s"$tag: ymin ($y1) must be < ymax ($y2)"
            val area = (x2 - x1).toLong * (y2 - y1).toLong
            if (x1 < x2 && y1 < y2 && area < 10)
              warns += s"$tag: suspiciously small box area ($area px)"
          case _ => errs += s"$tag: bndbox coordinates must all be integers"
        }
      }
    }
    VocIssues(errs.result(), warns.result())
  }

  final class PascalVocXmlValidator(dir: String, errorCap: Int = 50) extends Validator {
    val name = "pascal_voc_xml"
    def validate(ctx: ValidationContext): ValidationResult = {
      val spark = ctx.spark
      import spark.implicits._
      val files = spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.xml")
        .load(dir)
        .select(element_at(split(col("path"), "/"), -1).as("name"), col("content"))
        .filter(!col("name").startsWith("."))
      val issues = files.as[(String, Array[Byte])].mapPartitions { it =>
        it.flatMap { case (fname, bytes) =>
          val res = checkVocXml(fname,
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          res.errors.map(e => ("E", e)) ++ res.warnings.map(w => ("W", w))
        }
      }.toDF("kind", "msg")
      // Cap each kind INDEPENDENTLY: a single sorted limit would let a
      // flood of errors consume the whole fetch and silently drop every
      // warning. The cap is applied BEFORE the collect_list — a
      // row_number window keeps at most cap+1 sorted messages per kind,
      // so the aggregation buffer is bounded under exactly the
      // error-flood scenario the cap exists for (the window itself is a
      // spillable external sort, never an in-memory list). The cap
      // itself is reported, like BioLabelValidator.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("kind").orderBy("msg")
      val byKind: Map[String, List[String]] = issues
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= errorCap + 1)
        .groupBy("kind")
        .agg(sort_array(collect_list(col("msg"))).as("msgs"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1).toList)
        .toMap
      def capped(kind: String, what: String): List[String] = {
        val msgs = byKind.getOrElse(kind, Nil)
        if (msgs.length > errorCap)
          msgs.take(errorCap) :+ s"... (capped at $errorCap $what)"
        else msgs
      }
      val errs = capped("E", "errors")
      val warns = capped("W", "warnings")
      ValidationResult(byKind.getOrElse("E", Nil).isEmpty, errs, warns)
    }
  }
}
