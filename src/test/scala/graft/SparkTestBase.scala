package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (Test/fork := true → one JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.build("4")
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.1"
}
