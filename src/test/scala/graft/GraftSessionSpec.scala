package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftSession

/** The library's session entry point: recommended conf contents and
  * function registration on an existing session. (The builder path is
  * exercised implicitly — extensions-at-build is Spark-tested API; the
  * shared test JVM cannot build a second context to observe it.) */
class GraftSessionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("recommendedConf pins parallelism-sized shuffles, UTC, nanos parquet") {
    val conf = GraftSession.recommendedConf(cores = 16).toMap
    assert(conf("spark.sql.shuffle.partitions") === "16")
    assert(conf("spark.sql.session.timeZone") === "UTC")
    assert(conf("spark.sql.legacy.parquet.nanosAsLong") === "true")
  }

  test("resolveCores sizes to the master's task slots, not the host") {
    assert(GraftSession.resolveCores("local[8]") === 8)
    assert(GraftSession.resolveCores("local[8,2]") === 8) // maxFailures form
    assert(GraftSession.resolveCores("local") === 1) // ONE slot, not n_cpus
    assert(GraftSession.resolveCores("local[*]") ===
      Runtime.getRuntime.availableProcessors())
    assert(GraftSession.resolveCores("spark://host:7077") ===
      Runtime.getRuntime.availableProcessors()) // cluster: caller should pass cores
    assert(GraftSession.resolveCores("local", cores = 4) === 4) // explicit wins
  }

  test("register() enables every graft_* function on an existing session") {
    GraftSession.register(spark)
    val n = spark.sql(
      """SELECT size(graft_detect_fragments('{"a": 1}')) AS nf,
        |  length(graft_convert('METADATA\nid: 7')) AS nc""".stripMargin).head()
    assert(n.getInt(0) >= 1 && n.getInt(1) > 2)
  }
}
