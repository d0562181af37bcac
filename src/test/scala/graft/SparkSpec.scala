package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all operator specs — one JVM-wide session
  * (sbt forks a single test JVM), built through [[GraftSession]] so
  * tests run under exactly the engine's config (UTC, ANSI defaults,
  * small shuffle partitioning).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder("2").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
