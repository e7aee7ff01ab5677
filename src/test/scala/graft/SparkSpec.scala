package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + test-data paths for all specs. */
object TestSpark {
  lazy val session: SparkSession = GraftSession.local(cpus = 4, appName = "graft-test")
  val sf: String = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val sf: String = TestSpark.sf
}
