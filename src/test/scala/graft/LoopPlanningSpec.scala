package graft

import org.scalatest.funsuite.AnyFunSuite

/** The loop-planning escape hatch ('pinned') lost default-path suite
  * coverage when the default flipped to adaptive (r12 data drop
  * reversed the A/B — LoopPlanning scaladoc). This spec keeps the
  * hatch honest: both modes must produce identical rows, the pin must
  * restore the session's AQE conf (including across the lock-guarded
  * body), and a typo'd mode must fail fast, never silently change the
  * execution mode. */
class LoopPlanningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pinned mode: identical rows to adaptive, AQE conf restored") {
    val sp = spark
    val aqeBefore = sp.conf.get("spark.sql.adaptive.enabled", "true")
    val adaptive = SparkEntry.queries("op_dedup_cc")(sp, dir)
      .collect().map(_.toString).sorted
    sp.conf.set("spark.graft.loop.planning", "pinned")
    try {
      val pinned = SparkEntry.queries("op_dedup_cc")(sp, dir)
        .collect().map(_.toString).sorted
      assert(pinned.sameElements(adaptive),
        "pinned-mode rows differ from adaptive-mode rows")
      assert(sp.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore,
        "the pin leaked: spark.sql.adaptive.enabled not restored after the loop")
    } finally sp.conf.unset("spark.graft.loop.planning")
  }

  test("a typo'd planning mode fails fast instead of silently picking one") {
    val sp = spark
    sp.conf.set("spark.graft.loop.planning", "pnned")
    try {
      val e = intercept[RuntimeException] {
        graft.functions.LoopPlanning.pinned(sp) { fail("body must not run") }
      }
      assert(e.getMessage.contains("pnned"))
    } finally sp.conf.unset("spark.graft.loop.planning")
  }
}
