package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — sbt runs
  * suites sequentially in the forked JVM).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sc = spark.sparkContext

  def tmpDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  def write(path: java.nio.file.Path, content: String): java.nio.file.Path = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.write(path, content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.get("local[4]", 4)
    s
  }
}
