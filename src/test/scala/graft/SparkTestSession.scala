package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (JVM-wide, forked by sbt) —
  * built through the library's own entry point so the builder path
  * (recommended conf + extensions) is exercised by the whole suite. */
object SparkTestSession {
  lazy val spark: SparkSession = api.GraftSession.builder("local[4]", 4)
    .appName("graft-tests")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
