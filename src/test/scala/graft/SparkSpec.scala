package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (Spark startup dominates test
  * wall-clock otherwise). Small core/partition counts keep shuffles cheap
  * at test scale. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", cores = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SparkSpec.spark

  /** Smallest fixture dir (sf0.001) for data-driven specs. */
  val sfDir = "/root/testdata/sf0.001"

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
