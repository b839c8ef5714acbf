package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession per forked test JVM (build.sbt sets Test/fork). */
object TestSpark {
  lazy val spark: SparkSession = graft.spark.Sessions.local("graft-test", 4)
  val sf001 = "/root/testdata/sf0.001"
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf001: String = TestSpark.sf001
}
