package graft.core

import org.apache.spark.sql.types._

/** The engine's single source of truth for the declared-schema type
  * vocabulary (reference: `database.py:135-179`,
  * `validators/data_validator.py:356-821` — DDL mapper, validator, cast
  * layer and JSON per-record check all must accept the SAME type strings;
  * the reference had a NUMERIC regression from letting them drift,
  * `data_validator.py:62-68`).
  *
  * One ADT, parsed once; every layer (DDL, validation, cast, JSON checks)
  * consumes the parsed form.
  */
sealed trait SqlType {
  /** Spark runtime type this maps to. */
  def sparkType: DataType
  /** MySQL DDL rendering (round-trip of the accepted vocabulary). */
  def ddl: String
}

object SqlType {
  final case class Varchar(n: Int) extends SqlType {
    val sparkType = StringType; def ddl = s"VARCHAR($n)"
  }
  final case class Char(n: Int) extends SqlType {
    val sparkType = StringType; def ddl = s"CHAR($n)"
  }
  case object Text extends SqlType { val sparkType = StringType; def ddl = "TEXT" }
  case object IntT extends SqlType { val sparkType = IntegerType; def ddl = "INT" }
  case object BigIntT extends SqlType { val sparkType = LongType; def ddl = "BIGINT" }
  case object FloatT extends SqlType { val sparkType = DoubleType; def ddl = "FLOAT" }
  case object DoubleT extends SqlType { val sparkType = DoubleType; def ddl = "DOUBLE" }
  final case class Decimal(p: Int, s: Int) extends SqlType {
    val sparkType = DecimalType(p, s); def ddl = s"DECIMAL($p,$s)"
  }
  case object BoolT extends SqlType { val sparkType = BooleanType; def ddl = "BOOLEAN" }
  case object DateT extends SqlType { val sparkType = DateType; def ddl = "DATE" }
  case object DateTimeT extends SqlType { val sparkType = TimestampType; def ddl = "DATETIME" }
  case object TimeT extends SqlType {
    // Spark has no TimeType; HH:mm:ss strings preserve value + ordering.
    val sparkType = StringType; def ddl = "TIME"
  }
  case object Blob extends SqlType { val sparkType = BinaryType; def ddl = "BLOB" }

  private val Parens = """^([A-Z]+)\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$""".r

  /** Parse a declared MySQL type string. Vocabulary per
    * `database.py:135-156` + precision parse `database.py:170-179`.
    */
  // Bounds-checked constructors: every invalid shape must surface as
  // Left (the validation report / exit-2 contract), never as a thrown
  // exception out of `n.toInt` overflow or DecimalType's own
  // precision require — the same bug class as an unchecked source
  // path crashing the CLI with a stack trace.
  private def intArg(raw: String, n: String): Either[String, Int] =
    n.toIntOption.toRight(s"'$raw': length/precision out of range")

  private def varcharOf(raw: String, n: String): Either[String, SqlType] =
    intArg(raw, n).flatMap(v =>
      if (v >= 1 && v <= 65535) Right(Varchar(v))
      else Left(s"'$raw': VARCHAR length must be in [1, 65535]"))

  private def charOf(raw: String, n: String): Either[String, SqlType] =
    intArg(raw, n).flatMap(v =>
      if (v >= 1 && v <= 255) Right(Char(v))
      else Left(s"'$raw': CHAR length must be in [1, 255]"))

  private def decimalOf(raw: String, p: String, sc: String): Either[String, SqlType] =
    for {
      pp <- intArg(raw, p)
      ss <- Option(sc).fold[Either[String, Int]](Right(0))(intArg(raw, _))
      d <-
        // Spark's DecimalType caps precision at 38 (MySQL allows 65;
        // a wider panel needs a string column, reported here, not as
        // an internal assertion later).
        if (pp < 1 || pp > 38) Left(s"'$raw': DECIMAL precision must be in [1, 38]")
        else if (ss < 0 || ss > pp) Left(s"'$raw': DECIMAL scale must be in [0, precision]")
        else Right(Decimal(pp, ss))
    } yield d

  def parse(raw: String): Either[String, SqlType] = {
    val s = raw.trim.toUpperCase
    s match {
      case Parens("VARCHAR", n, null) => varcharOf(raw, n)
      case Parens("CHAR", n, null) => charOf(raw, n)
      case Parens("DECIMAL", p, sc) => decimalOf(raw, p, sc)
      case Parens("NUMERIC", p, sc) => decimalOf(raw, p, sc)
      case "VARCHAR" => Right(Varchar(255))
      case "CHAR" => Right(Char(1))
      case "TEXT" | "TINYTEXT" | "MEDIUMTEXT" | "LONGTEXT" => Right(Text)
      case "INT" | "INTEGER" | "TINYINT" | "SMALLINT" | "MEDIUMINT" => Right(IntT)
      case "BIGINT" => Right(BigIntT)
      case "FLOAT" => Right(FloatT)
      case "DOUBLE" | "REAL" => Right(DoubleT)
      case "DECIMAL" | "NUMERIC" => Right(Decimal(10, 0))
      case "BOOLEAN" | "BOOL" => Right(BoolT)
      case "DATE" => Right(DateT)
      case "DATETIME" | "TIMESTAMP" => Right(DateTimeT)
      case "TIME" => Right(TimeT)
      case "BLOB" | "LONGBLOB" | "MEDIUMBLOB" | "TINYBLOB" => Right(Blob)
      case other => Left(s"Unsupported column type: '$raw' (normalized '$other')")
    }
  }

  /** Parse a whole declared schema; accumulates all errors. */
  def parseSchema(declared: Seq[(String, String)]): Either[List[String], List[(String, SqlType)]] = {
    val parsed = declared.map { case (c, t) => (c, parse(t)) }
    val errs = parsed.collect { case (c, Left(e)) => s"$c: $e" }.toList
    if (errs.nonEmpty) Left(errs)
    else Right(parsed.collect { case (c, Right(t)) => (c, t) }.toList)
  }

  /** Spark StructType for a parsed feature schema (all nullable — the
    * reference tolerates missing values everywhere except data_id).
    */
  def toStructType(schema: Seq[(String, SqlType)]): StructType =
    StructType(schema.map { case (c, t) => StructField(c, t.sparkType, nullable = true) })
}
