package graft.engine.sink

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.core.{SqlType, StandardColumns}

/** Keyed upsert sink (SURVEY.md §2.10 K1, `database.py:337-478`):
  * batched upserts keyed on unique `data_id`, with
  *
  *  - per-record fallback: a failed batch is retried row-by-row so one
  *    bad record fails alone (`database.py:421-467`);
  *  - transient-error retry: 3 attempts, exponential backoff 1–8 s,
  *    rollback between attempts (`database.py:55-98`);
  *  - quote-escaped identifiers (`UniProt|gene` headers,
  *    `database.py:403-410`).
  *
  * Spark mapping: `df.foreachPartition` — one connection per partition,
  * prepared statements, executeBatch per `batchSize` rows. NOT
  * `df.write.jdbc` (no upsert, no per-row isolation). Parallelism =
  * partitions; at 1000 executors size partitions to the DB's write
  * capacity with a `repartition(n)` upstream.
  */
object JdbcUpsert {

  /** A statement + the row-field indices bound to its parameters, in
    * parameter order.
    */
  final case class Stmt(sql: String, bindOrder: Seq[Int]) extends Serializable

  /** SQL dialect. Engines with a native single-statement upsert (MySQL)
    * batch it directly; others batch INSERTs and resolve conflicts in
    * the per-row fallback (INSERT → on duplicate-key → UPDATE).
    */
  trait Dialect extends Serializable {
    def quote(id: String): String
    def createTableSql(table: String, features: Seq[(String, SqlType)]): String
    /** First-run bootstrap DDL for a missing database/catalog, if the
      * engine supports creating one over SQL (`database.py:111-127`
      * connects server-level and issues CREATE DATABASE IF NOT
      * EXISTS before using the configured database). None = engine
      * bootstraps another way (Derby's `;create=true` URL attribute).
      */
    def createDatabaseSql(db: String): Option[String] = None
    /** Native upsert statement, if the engine has one. */
    def upsert(table: String, columns: Seq[String], key: String): Option[Stmt]
    def insert(table: String, columns: Seq[String]): Stmt =
      Stmt(s"INSERT INTO ${quote(table)} (${columns.map(quote).mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")})", columns.indices)
    def update(table: String, columns: Seq[String], key: String): Stmt = {
      val updatable = columns.zipWithIndex
        .filterNot { case (c, _) => Set(key, "id", "created_at").contains(c) }
      val sets = updatable.map { case (c, _) => s"${quote(c)} = ?" }.mkString(", ")
      Stmt(s"UPDATE ${quote(table)} SET $sets WHERE ${quote(key)} = ?",
        updatable.map(_._2) :+ columns.indexOf(key))
    }
  }

  /** MySQL: INSERT ... ON DUPLICATE KEY UPDATE col=VALUES(col)
    * (`database.py:377-410`). Update-set excludes id/created_at/data_id.
    */
  object MySqlDialect extends Dialect {
    def quote(id: String): String = "`" + id.replace("`", "``") + "`"
    override def createDatabaseSql(db: String): Option[String] =
      Some(s"CREATE DATABASE IF NOT EXISTS ${quote(db)}")
    def upsert(table: String, columns: Seq[String], key: String): Option[Stmt] = {
      val cols = columns.map(quote).mkString(", ")
      val params = columns.map(_ => "?").mkString(", ")
      val updates = columns.filterNot(Set(key, "id", "created_at"))
        .map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
      Some(Stmt(s"INSERT INTO ${quote(table)} ($cols) VALUES ($params) " +
        s"ON DUPLICATE KEY UPDATE $updates", columns.indices))
    }
    def createTableSql(table: String, features: Seq[(String, SqlType)]): String = {
      val std =
        """`id` BIGINT PRIMARY KEY AUTO_INCREMENT,
          |`created_at` TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
          |`updated_at` TIMESTAMP DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
          |`status` INT DEFAULT 0,
          |`label` VARCHAR(255),
          |`data_intent` VARCHAR(100),
          |`data_id` VARCHAR(255) UNIQUE NOT NULL,
          |`filename` VARCHAR(255),
          |`extension` VARCHAR(10),
          |`annotation` TEXT,
          |`ingestor_id` VARCHAR(255)""".stripMargin
      val feats = features.map { case (c, t) => s"${quote(c)} ${t.ddl}" }
      s"CREATE TABLE IF NOT EXISTS ${quote(table)} (\n" +
        (std +: feats).mkString(",\n") + "\n)"
    }
  }

  /** Generic ANSI dialect (Derby/H2/Postgres): INSERT batches; conflicts
    * resolved row-wise as INSERT → duplicate-key → UPDATE. Used by the
    * embedded Derby integration tests.
    */
  object GenericDialect extends Dialect {
    def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""
    def upsert(table: String, columns: Seq[String], key: String): Option[Stmt] = None
    def createTableSql(table: String, features: Seq[(String, SqlType)]): String = {
      val std =
        """"id" BIGINT GENERATED ALWAYS AS IDENTITY PRIMARY KEY,
          |"created_at" TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
          |"updated_at" TIMESTAMP DEFAULT CURRENT_TIMESTAMP,
          |"status" INT DEFAULT 0,
          |"label" VARCHAR(255),
          |"data_intent" VARCHAR(100),
          |"data_id" VARCHAR(255) UNIQUE NOT NULL,
          |"filename" VARCHAR(255),
          |"extension" VARCHAR(10),
          |"annotation" CLOB,
          |"ingestor_id" VARCHAR(255)""".stripMargin
      val feats = features.map { case (c, t) =>
        val ddl = t match {
          case SqlType.Text => "CLOB" // Derby has no TEXT
          case SqlType.DateTimeT => "TIMESTAMP"
          case other => other.ddl
        }
        s"${quote(c)} $ddl"
      }
      s"CREATE TABLE ${quote(table)} (\n" + (std +: feats).mkString(",\n") + "\n)"
    }
  }

  final case class Config(
      url: String,
      table: String,
      dialect: Dialect,
      keyColumn: String = "data_id",
      batchSize: Int = 4000,
      maxRetries: Int = 3,
      user: Option[String] = None,
      password: Option[String] = None)

  private def isTransient(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLTransientException] ||
      e.isInstanceOf[java.sql.SQLRecoverableException] ||
      e.isInstanceOf[java.sql.SQLNonTransientConnectionException]

  /** Transient SQL errors retried with exponential backoff 1s,2s,4s
    * (capped 8s); rollback between attempts (`database.py:55-98`).
    */
  private[sink] def withRetry[T](conn: Connection, maxRetries: Int,
                                 sleepMs: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: java.sql.SQLException if isTransient(e) && attempt < maxRetries =>
          try conn.rollback() catch { case _: Exception => () }
          sleepMs(math.min(1000L << attempt, 8000L))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def sqlTypeCode(dt: DataType): Int = dt match {
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType => java.sql.Types.BINARY
    case _ => java.sql.Types.VARCHAR
  }

  private def bind(ps: PreparedStatement, row: Row, fields: Array[StructField],
                   order: Seq[Int]): Unit = {
    var p = 1
    order.foreach { i =>
      val v = row.get(i)
      // Strict engines (Derby) reject Types.NULL — bind the column's
      // real JDBC type code for SQL NULL.
      if (v == null) ps.setNull(p, sqlTypeCode(fields(i).dataType))
      else fields(i).dataType match {
        case IntegerType => ps.setInt(p, row.getInt(i))
        case LongType => ps.setLong(p, row.getLong(i))
        case DoubleType => ps.setDouble(p, row.getDouble(i))
        case FloatType => ps.setFloat(p, row.getFloat(i))
        case BooleanType => ps.setBoolean(p, row.getBoolean(i))
        case TimestampType => ps.setTimestamp(p, row.getTimestamp(i))
        case DateType => ps.setDate(p, row.getDate(i))
        case _: DecimalType => ps.setBigDecimal(p, row.getDecimal(i))
        case BinaryType => ps.setBytes(p, row.getAs[Array[Byte]](i))
        case _ => ps.setString(p, String.valueOf(v))
      }
      p += 1
    }
  }

  /** Serializable bundle of the statements + bind metadata a partition
    * needs; built once on the driver from the frame's schema.
    */
  private final case class Plan(
      fields: Array[StructField], keyIdx: Int,
      nativeUpsert: Option[Stmt], insertStmt: Stmt, updateStmt: Stmt,
      batchStmt: Stmt) extends Serializable

  private def plan(df: DataFrame, cfg: Config): Plan = {
    val fields = df.schema.fields
    val columns = fields.map(_.name).toSeq
    val nativeUpsert = cfg.dialect.upsert(cfg.table, columns, cfg.keyColumn)
    val insertStmt = cfg.dialect.insert(cfg.table, columns)
    Plan(fields, columns.indexOf(cfg.keyColumn), nativeUpsert, insertStmt,
      cfg.dialect.update(cfg.table, columns, cfg.keyColumn),
      nativeUpsert.getOrElse(insertStmt))
  }

  /** One partition's upsert loop: batched executeBatch, per-row
    * fallback on batch failure (`database.py:421-467`), transient
    * retry. Reports via callbacks so callers choose their channel —
    * accumulators ([[write]]) or an emitted failed-keys frame
    * ([[writeTracked]]).
    */
  private def upsertPartition(it: Iterator[Row], cfg: Config, p: Plan,
                              onUpserted: Int => Unit,
                              onFailed: Row => Unit): Unit =
    if (it.nonEmpty) {
      val conn = (cfg.user, cfg.password) match {
        case (Some(u), Some(pw)) => DriverManager.getConnection(cfg.url, u, pw)
        case _ => DriverManager.getConnection(cfg.url)
      }
      conn.setAutoCommit(false)
      try {
        val psBatch = conn.prepareStatement(p.batchStmt.sql)
        val psInsert = conn.prepareStatement(p.insertStmt.sql)
        val psUpdate = conn.prepareStatement(p.updateStmt.sql)
        try {
          val batch = new scala.collection.mutable.ArrayBuffer[Row](cfg.batchSize)

          def upsertRow(r: Row): Unit = p.nativeUpsert match {
            case Some(u) =>
              withRetry(conn, cfg.maxRetries) {
                bind(psBatch, r, p.fields, u.bindOrder)
                psBatch.executeUpdate()
                conn.commit()
              }
            case None =>
              withRetry(conn, cfg.maxRetries) {
                try {
                  bind(psInsert, r, p.fields, p.insertStmt.bindOrder)
                  psInsert.executeUpdate()
                  conn.commit()
                } catch {
                  case dup: java.sql.SQLIntegrityConstraintViolationException =>
                    conn.rollback()
                    bind(psUpdate, r, p.fields, p.updateStmt.bindOrder)
                    // The fallback assumes the violation was a data_id
                    // duplicate; if the UPDATE matches nothing the
                    // violation came from some OTHER constraint (a
                    // UNIQUE/CHECK/FK added out-of-band) and the row is
                    // NOT in the table — counting it upserted would
                    // register metadata for a row that does not exist.
                    val matched = psUpdate.executeUpdate()
                    conn.commit()
                    if (matched == 0) throw dup
                }
              }
          }

          def flush(): Unit = if (batch.nonEmpty) {
            try {
              withRetry(conn, cfg.maxRetries) {
                batch.foreach { r => bind(psBatch, r, p.fields, p.batchStmt.bindOrder); psBatch.addBatch() }
                psBatch.executeBatch()
                conn.commit()
              }
              onUpserted(batch.size)
            } catch {
              case _: java.sql.SQLException =>
                // Batch failed → per-row fallback isolates offenders
                // (`database.py:421-467`).
                try conn.rollback() catch { case _: Exception => () }
                psBatch.clearBatch()
                batch.foreach { r =>
                  try { upsertRow(r); onUpserted(1) }
                  catch {
                    case _: java.sql.SQLException =>
                      try conn.rollback() catch { case _: Exception => () }
                      onFailed(r)
                  }
                }
            }
            batch.clear()
          }

          it.foreach { r =>
            batch += r
            if (batch.size >= cfg.batchSize) flush()
          }
          flush()
        } finally { psBatch.close(); psInsert.close(); psUpdate.close() }
      } finally conn.close()
    }

  /** Execute the upsert over every partition. `upserted`/`failed` are
    * executor-populated accumulators (the A1 failure-channel counters).
    * `failedKeys`, when given, collects a DIAGNOSTIC SAMPLE of the
    * key-column values that land in the failed channel — capped at
    * `maxFailedKeysPerPartition` keys per partition, because under a
    * systemic outage (DB down, credential rotation) EVERY row of a
    * large batch fails after retries and an uncapped accumulator would
    * haul millions of key strings to the driver — an OOM in exactly
    * the scenario the failure channel exists for. Because of that cap
    * the sample is NOT a complete dead-letter set and MUST NOT drive
    * registration exclusion ("a row that is NOT in the table must
    * never be registered"): that invariant needs [[writeTracked]],
    * whose returned failed-key frame is complete and never routes keys
    * through the driver (the engine's registration path,
    * `Ingestor.scala`, uses it). `failed` always carries the full
    * magnitude; compare it against the collected key count to detect
    * truncation (the streaming report's `failedKeysTruncated`).
    */
  def write(df: DataFrame, cfg: Config,
            upserted: LongAccumulator, failed: LongAccumulator,
            failedKeys: Option[org.apache.spark.util.CollectionAccumulator[String]] = None,
            maxFailedKeysPerPartition: Int = 1000): Unit = {
    val p = plan(df, cfg)
    df.foreachPartition { (it: Iterator[Row]) =>
      var collected = 0
      upsertPartition(it, cfg, p, n => upserted.add(n.toLong), r => {
        failed.add(1)
        if (p.keyIdx >= 0 && collected < maxFailedKeysPerPartition) {
          failedKeys.foreach(_.add(String.valueOf(r.get(p.keyIdx))))
          collected += 1
        }
      })
    }
  }

  /** Scale-safe upsert: performs the same partition-wise keyed upsert
    * but reports failures as a RETURNED DataFrame of failed key values
    * (column `failed_key`) instead of driver-side accumulators, so the
    * caller can `left_anti`-join downstream stages (API metadata
    * registration) against it without any O(rows) — or even
    * O(failures) — driver materialization.
    *
    * LAZY: the upsert executes when the returned frame is first
    * materialized. Callers must `persist()` it and run ONE action
    * (e.g. `count()`) before reusing it in joins, or every downstream
    * action re-runs the upsert. Re-execution on task retry is safe —
    * the upsert is idempotent, keyed on `cfg.keyColumn` — but wasteful.
    */
  def writeTracked(df: DataFrame, cfg: Config): DataFrame = {
    // Fail loud, not null: a NULL failed_key never matches the caller's
    // left_anti condition, so failed rows would silently keep flowing
    // to API metadata registration — the exact invariant this frame
    // exists to protect. Without a key column it cannot be upheld.
    require(df.columns.contains(cfg.keyColumn),
      s"writeTracked requires key column '${cfg.keyColumn}' in the frame " +
        s"(columns: ${df.columns.mkString(", ")}) — failed-row exclusion " +
        "is keyed on it")
    val p = plan(df, cfg)
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions { it =>
      val failedKeys = scala.collection.mutable.ArrayBuffer.empty[String]
      upsertPartition(it, cfg, p, _ => (), r =>
        failedKeys += String.valueOf(r.get(p.keyIdx)))
      failedKeys.iterator
    }.toDF("failed_key")
  }

  /** Driver-side DDL: create the table if absent, else drift-check the
    * feature columns (`database.py:184-335`, drift `:254-297`). Feature
    * schema passes the StandardColumns guards first.
    */
  def ensureTable(cfg: Config, features: Seq[(String, SqlType)]): Either[List[String], Unit] = {
    val guardErrs = StandardColumns.check(features.map(_._1))
    if (guardErrs.nonEmpty) return Left(guardErrs)
    ensureDatabase(cfg) match {
      case Left(errs) => return Left(errs)
      case Right(()) => ()
    }
    val conn = (cfg.user, cfg.password) match {
      case (Some(u), Some(p)) => DriverManager.getConnection(cfg.url, u, p)
      case _ => DriverManager.getConnection(cfg.url)
    }
    try {
      val meta = conn.getMetaData
      val rs = meta.getTables(null, null, "%", Array("TABLE"))
      var exists = false
      while (rs.next())
        if (rs.getString("TABLE_NAME").equalsIgnoreCase(cfg.table)) exists = true
      if (exists) {
        val existingCols = scala.collection.mutable.Set[String]()
        for (t <- Seq(cfg.table.toUpperCase, cfg.table); if existingCols.isEmpty) {
          val cols = meta.getColumns(null, null, t, "%")
          while (cols.next()) existingCols += cols.getString("COLUMN_NAME").toLowerCase
        }
        val expected = features.map(_._1.toLowerCase).toSet
        val existingFeatures = existingCols.toSet --
          StandardColumns.names.map(_.toLowerCase).toSet
        StandardColumns.driftError(existingFeatures, expected) match {
          case Some(err) => Left(List(err))
          case None => Right(())
        }
      } else {
        val st = conn.createStatement()
        try { st.executeUpdate(cfg.dialect.createTableSql(cfg.table, features)); Right(()) }
        finally st.close()
      }
    } finally conn.close()
  }

  /** Split a network JDBC URL into (server-level URL, database name):
    * `jdbc:mysql://host:3306/mydb?useSSL=false` →
    * (`jdbc:mysql://host:3306?useSSL=false`, `mydb`). None when the
    * URL carries no database path (embedded engines like
    * `jdbc:derby:/path;create=true`, or a server URL without one).
    */
  private[engine] def splitDbUrl(url: String): Option[(String, String)] = {
    val m = "^(jdbc:[a-zA-Z0-9_]+://[^/?;]+)/([^/?;]+)([?;].*)?$".r
    url match {
      case m(base, db, params) =>
        Some((base + Option(params).getOrElse(""), db))
      case _ => None
    }
  }

  /** First-run database bootstrap (`database.py:111-127` parity):
    * when the dialect can CREATE DATABASE over SQL and the URL names
    * one, connect at server level and issue the idempotent create —
    * so a fresh MySQL host needs no manual step before the first
    * ingest. No-op (Right) when the URL has no database path or the
    * dialect bootstraps another way.
    */
  def ensureDatabase(cfg: Config): Either[List[String], Unit] =
    splitDbUrl(cfg.url) match {
      case None => Right(())
      case Some((baseUrl, db)) =>
        cfg.dialect.createDatabaseSql(db) match {
          case None => Right(())
          case Some(sql) =>
            try {
              val conn = (cfg.user, cfg.password) match {
                case (Some(u), Some(p)) =>
                  DriverManager.getConnection(baseUrl, u, p)
                case _ => DriverManager.getConnection(baseUrl)
              }
              try { val st = conn.createStatement()
                try { st.executeUpdate(sql); Right(()) }
                finally st.close()
              } finally conn.close()
            } catch {
              case e: java.sql.SQLException =>
                Left(List(s"database bootstrap failed for '$db': ${e.getMessage}"))
            }
        }
    }
}
