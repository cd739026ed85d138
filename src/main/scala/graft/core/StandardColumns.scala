package graft.core

import org.apache.spark.sql.types._

/** Framework-managed table shape + identifier guards.
  *
  * Reference: the 11 standard columns every destination table carries
  * (`database.py:302-331`), reserved-name collision rejection
  * (`database.py:203-215`), 64-char identifier limit
  * (`database.py:221-229`), ≤4000 feature columns (`database.py:240-248`)
  * and schema-drift detection against a pre-existing table
  * (`database.py:254-297`).
  */
object StandardColumns {

  /** Names of the 11 framework columns, in DDL order. */
  val names: Seq[String] = Seq(
    "id", "created_at", "updated_at", "status", "label", "data_intent",
    "data_id", "filename", "extension", "annotation", "ingestor_id")

  val reserved: Set[String] = names.toSet

  /** StructType of the standard prefix as the engine materializes it
    * (id is sink-assigned, so it is absent from the in-engine frame).
    */
  val struct: StructType = StructType(Seq(
    StructField("created_at", TimestampType, nullable = false),
    StructField("updated_at", TimestampType, nullable = false),
    StructField("status", IntegerType, nullable = false),
    StructField("label", StringType, nullable = true),
    StructField("data_intent", StringType, nullable = true),
    StructField("data_id", StringType, nullable = false),
    StructField("filename", StringType, nullable = true),
    StructField("extension", StringType, nullable = true),
    StructField("annotation", StringType, nullable = true),
    StructField("ingestor_id", StringType, nullable = true)))

  val maxIdentifierLength = 64
  val maxFeatureColumns = 4000

  /** All identifier/shape guards in one pass; returns every violation
    * (errors accumulate, mirroring the reference's combined report).
    */
  def check(featureColumns: Seq[String]): List[String] = {
    val collisions = featureColumns.filter(c => reserved(c.toLowerCase))
    val tooLong = featureColumns.filter(_.length > maxIdentifierLength)
    val countErr =
      if (featureColumns.size > maxFeatureColumns)
        List(s"Too many feature columns: ${featureColumns.size} > $maxFeatureColumns")
      else Nil
    // Case-insensitive, like every other identifier guard here and the
    // sink's drift check: MySQL column names are case-insensitive, so
    // ("Qty", "qty") is a duplicate the DDL would reject with a raw
    // 1060 instead of this structured report.
    val dupes = featureColumns.groupBy(_.toLowerCase).collect {
      case (_, occ) if occ.size > 1 => occ.head
    }.toList.sorted
    collisions.map(c => s"Column name '$c' collides with a framework-managed column").toList ++
      tooLong.map(c => s"Column name '$c' exceeds $maxIdentifierLength characters").toList ++
      dupes.map(c => s"Duplicate column name '$c'") ++
      countErr
  }

  /** Schema-drift check against an existing table's feature-column set.
    * Returns None when identical, otherwise an actionable message naming
    * both sides (`database.py:277-297` behavior).
    */
  def driftError(existing: Set[String], declared: Set[String]): Option[String] = {
    if (existing == declared) None
    else {
      val missing = (declared -- existing).toList.sorted
      val extra = (existing -- declared).toList.sorted
      Some(
        s"Schema drift: declared columns missing from table: ${missing.mkString("[", ", ", "]")}; " +
          s"table columns absent from declaration: ${extra.mkString("[", ", ", "]")}")
    }
  }

  /** MySQL-style backtick escaping for identifiers that contain special
    * characters (`database.py:403-410` — `UniProt|gene` headers).
    */
  def quoteIdentifier(name: String): String =
    "`" + name.replace("`", "``") + "`"
}
