package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all specs (JVM-wide, forked by sbt). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config(sources.Tables.eventsConf._1, sources.Tables.eventsConf._2)
    .getOrCreate()
}
