package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite run (JVM-wide — Spark
  * sessions are expensive; ScalaTest runs suites sequentially in one forked
  * JVM per build.sbt's `Test / fork := true`).
  */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = LocalSpark.session("4", "graft-tests")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  protected lazy val spark: SparkSession = SparkTestBase.spark
}
