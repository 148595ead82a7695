package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite; stopped by the JVM,
  * not per-suite, so parallel suites don't tear down a shared context). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(cpus = "4", appName = "graft-test")
  lazy val sf0001 = "/root/testdata/sf0.001"

  override def afterAll(): Unit = { /* shared context left running */ }
}
