package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** The loop-planning escape hatch ('pinned') lost default-path suite
  * coverage when the default flipped to adaptive (r12 data drop
  * reversed the A/B — LoopPlanning scaladoc). This spec keeps the
  * hatch honest: both modes must produce identical rows, the pin must
  * be invisible to the caller's session (r13: the pin lives on a
  * cloned session, so a concurrent query keeps AQE), and a typo'd
  * mode must fail fast, never silently change the execution mode. */
class LoopPlanningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("pinned mode: identical rows to adaptive, AQE conf untouched") {
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
        "the pin leaked: spark.sql.adaptive.enabled changed on the caller's session")
    } finally sp.conf.unset("spark.graft.loop.planning")
  }

  test("a concurrent query on the caller's session plans WITH AQE while a loop is pinned") {
    val sp = spark
    import sp.implicits._
    def isAdaptive(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec]
    // a shuffle query so AQE actually wraps the plan when enabled
    def shuffleQuery(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      Seq(1, 2, 2, 3).toDF("k").groupBy("k").count()
    }
    sp.conf.set("spark.graft.loop.planning", "pinned")
    try {
      val probe = graft.functions.LoopPlanning.pinned(Seq(1, 2).toDF("k")) { rerooted =>
        // INSIDE the pinned window: the loop's own session is pinned…
        assert(rerooted.sparkSession ne sp, "pinned mode must hand back a cloned session")
        assert(rerooted.sparkSession.conf.get("spark.sql.adaptive.enabled") == "false")
        assert(!isAdaptive(shuffleQuery(rerooted.sparkSession)),
          "the loop's own plan should be non-adaptive under the pin")
        // …while a query planned on the CALLER's session (what any
        // concurrent thread would do) still gets the adaptive wrapper
        assert(isAdaptive(shuffleQuery(sp)),
          "a concurrent caller-session query lost AQE during a pinned loop")
        rerooted.count()
      }
      assert(probe == 2L)
      assert(sp.conf.get("spark.sql.adaptive.enabled", "true") == "true")
    } finally sp.conf.unset("spark.graft.loop.planning")
  }

  test("pinned re-root resolves the frame eagerly and leaves no temp view behind") {
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.graft.loop.planning", "pinned")
    try {
      val rows = graft.functions.LoopPlanning.pinned(Seq(1, 2, 3).toDF("k")) { df =>
        // downstream derivation after both transient views are dropped
        df.groupBy().sum("k").collect().map(_.getLong(0)).toSeq
      }
      assert(rows == Seq(6L))
      assert(!sp.catalog.listTables().collect()
        .exists(_.name.startsWith("graft_loop_pin_")),
        "transient pin view leaked into the caller's catalog")
    } finally sp.conf.unset("spark.graft.loop.planning")
  }

  test("a typo'd planning mode fails fast instead of silently picking one") {
    val sp = spark
    import sp.implicits._
    sp.conf.set("spark.graft.loop.planning", "pnned")
    try {
      val e = intercept[RuntimeException] {
        graft.functions.LoopPlanning.pinned(Seq(1).toDF("k")) { _ =>
          fail("body must not run")
        }
      }
      assert(e.getMessage.contains("pnned"))
    } finally sp.conf.unset("spark.graft.loop.planning")
  }
}
