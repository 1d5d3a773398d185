package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session; suites run
  * sequentially under sbt's forked test JVM).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // same extension surface as production sessions (GraftSession)
    graft.plans.GraftExtensions.install(s)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
  /** Data root for hand-invoked dev profiles (the ignored Dev* suites):
    * overridable via `-Dgraft.testdata=…` or GRAFT_TESTDATA so they
    * stay runnable on a checkout whose test data lives elsewhere.
    */
  def devDataRoot: String =
    sys.props.get("graft.testdata")
      .orElse(sys.env.get("GRAFT_TESTDATA"))
      .getOrElse("/root/testdata")
  /** A fresh path that does NOT yet exist (Spark writers refuse to
    * overwrite an existing dir in default mode).
    */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("out").toString
}
