package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.YamlConfig
import graft.engine.Ingestor
import graft.engine.api.LocalApiClient
import graft.engine.sink.JdbcUpsert

/** Declarative entry point (SURVEY.md §3.1): YAML config → resolve →
  * ingest. Exit codes match the reference (`cli/run.py:156-166`):
  * 0 clean, 1 failed records, 2 config/validation error.
  *
  * Usage: IngestCli <config.yaml> [jdbcUrl]
  *   GRAFT_CONFIG env var is honoured when no argument is given
  *   (the reference reads INGEST_CONFIG the same way).
  *   Without a jdbcUrl the run is a dry run (no DB sink).
  */
object IngestCli {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    val configPath = args.headOption.orElse(sys.env.get("GRAFT_CONFIG")).getOrElse {
      System.err.println("usage: IngestCli <config.yaml> [jdbcUrl]")
      return 2
    }
    val config = YamlConfig.load(configPath) match {
      case Left(errs) =>
        System.err.println(s"Configuration invalid (${errs.size} error(s)):")
        errs.foreach(e => System.err.println(s"  $e"))
        return 2
      case Right(c) => c
    }
    val jdbc = args.lift(1).orElse(sys.env.get("GRAFT_JDBC_URL")).map { url =>
      val dialect =
        if (url.startsWith("jdbc:mysql")) JdbcUpsert.MySqlDialect
        else JdbcUpsert.GenericDialect
      JdbcUpsert.Config(url, config.tableName, dialect, batchSize = config.batchSize)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-ingest-${config.tableName}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Backend selection mirrors the reference's EDGE_ENV switch
    // (api/client.py:36-63): no endpoint configured → local recorder;
    // GRAFT_API_ENDPOINT set → production HTTP client whose token
    // provider re-reads GRAFT_BACKEND_TOKEN on each 401 so secret
    // rotation is picked up mid-run (client.py:133-172).
    val api = sys.env.get("GRAFT_API_ENDPOINT") match {
      case Some(endpoint) =>
        new graft.engine.api.HttpApiClient(graft.engine.api.HttpApiClient.Config(
          endpoint = endpoint,
          tokenProvider = () => sys.env.getOrElse("GRAFT_BACKEND_TOKEN", ""),
          ingestorId = sys.env.getOrElse("GRAFT_INGESTOR_ID", config.tableName),
          dataIntent = config.intent,
          category = config.category,
          dataFormat = config.dataFormat))
      case None => new LocalApiClient
    }
    try {
      val ingestor = new Ingestor(spark, config, api, jdbc,
        lockDir = sys.env.getOrElse("GRAFT_LOCK_DIR", "/tmp/graft-locks"))
      val result = ingestor.ingest()
      if (result.warnings.nonEmpty) {
        System.err.println(s"Warnings (${result.warnings.size}):")
        result.warnings.foreach(w => System.err.println(s"  [warn] $w"))
      }
      if (result.errors.nonEmpty) {
        System.err.println(s"Ingest failed (${result.errors.size} error(s)):")
        result.errors.foreach(e => System.err.println(s"  $e"))
      }
      println(result.summary.banner)
      result.exitCode
    } finally spark.stop()
  }
}
