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

  /** Pin a runtime conf for the duration of `body` (the session is shared
    * across suites, so plan-shape assertions that depend on a conf must set
    * it explicitly rather than inherit whatever a prior test left).
    */
  def withConf(key: String, value: String)(body: => Unit): Unit = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
