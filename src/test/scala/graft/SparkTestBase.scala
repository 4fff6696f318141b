package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4")
      .appName("graft-test")
      // A codegen compile failure must fail the suite, not silently
      // degrade to interpreted eval (round-4 DistArray regression:
      // 60 ERROR CodeGenerator lines, results correct, kernel defeated)
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // TEST-ONLY: the ≤100-row rank windows several specs drive on
    // purpose each emit "No Partition Defined for Window operation!"
    // at WARN — thousands of lines burying real signal in the suite
    // log. Silence exactly that package's WARNs here (never in main:
    // on a cluster that warning is load-bearing).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf = sys.env.getOrElse("GRAFT_TEST_SF", "/root/testdata/sf0.001")
  /** Sibling larger fixture for tests that need many parquet row
    * groups (e.g. the z-order pruning measurement); guard uses with
    * `assume(sfLargeExists)` so the suite still runs where only the
    * small fixture is present. */
  val sfLarge = sys.env.getOrElse("GRAFT_TEST_SF_LARGE",
    new java.io.File(sf).getParent + "/sf0.1")
  def sfLargeExists: Boolean = new java.io.File(sfLarge).isDirectory
}
