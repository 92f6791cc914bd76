package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks one test JVM). */
object TestSpark {
  lazy val session: SparkSession = {
    val s = GraftSession.get("local[4]")
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
