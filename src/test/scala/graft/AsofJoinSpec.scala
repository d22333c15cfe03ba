package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the composed as-of join (B6b), pinned on a
  * hand-built corpus (the 1,836-row DuckDB ASOF comparison covers the
  * statistics; this covers the edges by name). */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("at-or-before is inclusive; views with no prior click drop; latest click wins") {
    val ev = Seq(
      // user 1: click at 10:00, views before/at/after it
      (1L, t("2024-01-01 09:59:00"), 1L, "view", 1.0, "{}"),  // BEFORE any click -> dropped
      (2L, t("2024-01-01 10:00:00"), 1L, "click", 5.0, "{}"),
      (3L, t("2024-01-01 10:00:00"), 1L, "view", 2.0, "{}"),  // SAME second -> matches (inclusive)
      (4L, t("2024-01-01 10:30:00"), 1L, "view", 3.0, "{}"),  // after -> matches 10:00
      (5L, t("2024-01-01 11:00:00"), 1L, "click", 7.0, "{}"),
      (6L, t("2024-01-01 11:05:00"), 1L, "view", 4.0, "{}"),  // matches LATEST click (11:00)
      // user 2: two clicks in the same second -> max(value) wins deterministically
      (7L, t("2024-01-01 10:00:00"), 2L, "click", 1.0, "{}"),
      (8L, t("2024-01-01 10:00:00"), 2L, "click", 9.0, "{}"),
      (9L, t("2024-01-01 10:01:00"), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // the real events.parquet is TIMESTAMP(NANOS), which the engine
      // reads as a nanos LONG under the legacy conf — mirror that shape
      .withColumn("ts", (col("ts").cast("long") * 1000000000L))

    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = graft.operators.Relational.joinAsof(spark, dir)
      .select("event_id", "click_tsf", "click_value").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap

    assert(!out.contains(1L), "view before any click must drop (inner as-of)")
    assert(out(3L) === (("2024-01-01 10:00:00", 5.0)), "same-second click matches (inclusive)")
    assert(out(4L) === (("2024-01-01 10:00:00", 5.0)))
    assert(out(6L) === (("2024-01-01 11:00:00", 7.0)), "latest prior click wins")
    assert(out(9L) === (("2024-01-01 10:00:00", 9.0)), "same-second click dup deduped to max value")
  }
}
