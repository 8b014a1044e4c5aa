package graft

import graft.pipeline.GraftSession
import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark suites (sbt forks one test JVM). */
object SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local(4)
}
