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

  test("pinned mode: identical rows to adaptive on BOTH loops, AQE conf untouched") {
    val sp = spark
    val aqeBefore = sp.conf.get("spark.sql.adaptive.enabled", "true")
    for (op <- Seq("op_dedup_cc", "op_graph_pagerank")) {
      val adaptive = SparkEntry.queries(op)(sp, dir)
        .collect().map(_.toString).sorted
      sp.conf.set("spark.graft.loop.planning", "pinned")
      try {
        val pinned = SparkEntry.queries(op)(sp, dir)
          .collect().map(_.toString).sorted
        assert(pinned.sameElements(adaptive),
          s"$op: pinned-mode rows differ from adaptive-mode rows")
        assert(sp.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore,
          s"$op: the pin leaked: spark.sql.adaptive.enabled changed on the caller's session")
      } finally sp.conf.unset("spark.graft.loop.planning")
    }
  }

  test("the pin-scoped clone inherits the caller's runtime conf") {
    // The interaction that would break silently: a pinned loop on a
    // checkpoint-dir'd cluster session must still see
    // spark.graft.checkpoint.reliable (Checkpoints.truncate reads the
    // conf off the FRAME's session — the clone). A clone losing
    // runtime conf would also drop shuffle.partitions sizing. The
    // reliable end-to-end loop itself is certified by CheckpointsSpec;
    // here we pin that the clone carries the conf into the loop.
    // (No checkpoint DIR is set: it is context-level, can never be
    // unset, and CheckpointsSpec assumes no earlier suite set one.)
    val sp = spark
    import sp.implicits._
    // restore (not unset) afterwards: CheckpointsSpec deliberately
    // leaves reliable=never on the shared session for later suites
    val savedReliable = sp.conf.getOption("spark.graft.checkpoint.reliable")
    sp.conf.set("spark.graft.loop.planning", "pinned")
    sp.conf.set("spark.graft.checkpoint.reliable", "never")
    sp.conf.set("spark.graft.probe.custom", "carried")
    try {
      graft.functions.LoopPlanning.pinned(Seq(1L).toDF("x")) { df =>
        val c = df.sparkSession.conf
        assert(c.get("spark.graft.checkpoint.reliable") == "never",
          "clone lost the checkpoint-mode conf — a pinned loop on a " +
            "cluster session would silently fall back to localCheckpoint")
        assert(c.get("spark.graft.probe.custom") == "carried",
          "clone lost arbitrary runtime conf")
        assert(c.get("spark.sql.shuffle.partitions") ==
          sp.conf.get("spark.sql.shuffle.partitions"),
          "clone lost shuffle-partition sizing")
        df
      }
    } finally {
      sp.conf.unset("spark.graft.loop.planning")
      savedReliable match {
        case Some(m) => sp.conf.set("spark.graft.checkpoint.reliable", m)
        case None => sp.conf.unset("spark.graft.checkpoint.reliable")
      }
      sp.conf.unset("spark.graft.probe.custom")
    }
  }

  test("a concurrent query on the caller's session plans WITH AQE while a loop is pinned") {
    val sp = spark
    import sp.implicits._
    // ADVICE r13: the isAdaptive asserts REQUIRE AQE on, so force it
    // for the test's duration and restore the captured pre-test value
    // after — an earlier suite leaving AQE off must produce neither a
    // false pin-leak failure nor a leaked conf change from this test
    val aqeBefore = sp.conf.get("spark.sql.adaptive.enabled", "true")
    sp.conf.set("spark.sql.adaptive.enabled", "true")
    def isAdaptive(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.isInstanceOf[AdaptiveSparkPlanExec]
    // a shuffle query so AQE actually wraps the plan when enabled
    def shuffleQuery(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      Seq(1, 2, 2, 3).toDF("k").groupBy("k").count()
    }
    sp.conf.set("spark.graft.loop.planning", "pinned")
    try {
      val result = graft.functions.LoopPlanning.pinned(Seq(1, 2).toDF("k")) { rerooted =>
        // INSIDE the pinned window: the loop's own session is pinned…
        assert(rerooted.sparkSession ne sp, "pinned mode must hand back a cloned session")
        assert(rerooted.sparkSession.conf.get("spark.sql.adaptive.enabled") == "false")
        assert(!isAdaptive(shuffleQuery(rerooted.sparkSession)),
          "the loop's own plan should be non-adaptive under the pin")
        // …while a query planned on the CALLER's session (what any
        // concurrent thread would do) still gets the adaptive wrapper
        assert(isAdaptive(shuffleQuery(sp)),
          "a concurrent caller-session query lost AQE during a pinned loop")
        rerooted.groupBy("k").count()
      }
      // the RESULT is re-rooted back onto the caller: post-loop
      // execution (and anything derived from it) keeps AQE
      assert(result.sparkSession eq sp,
        "pinned mode must hand the result back on the caller's session")
      assert(isAdaptive(result),
        "post-loop execution of the result lost AQE — the pin leaked past the loop")
      assert(result.count() == 2L)
      assert(sp.conf.get("spark.sql.adaptive.enabled", "true") == "true",
        "caller-session AQE conf moved across the pinned loop")
    } finally {
      sp.conf.unset("spark.graft.loop.planning")
      sp.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }

  test("pinned re-root preserves a caller-side cache on the input frame") {
    // The temp-view re-root this replaced had a real side effect:
    // dropTempView un-caches the view's plan through the SHARED cache
    // manager, evicting a caller-cached input. The ofRows re-root must
    // leave the caller's cache entry alone (and the loop still reads
    // it — cache lookups are plan-based and shared with the clone).
    val sp = spark
    import sp.implicits._
    val input = Seq(1, 2, 3).toDF("k")
    input.cache()
    try {
      input.count() // materialize the cache entry
      sp.conf.set("spark.graft.loop.planning", "pinned")
      val rows = graft.functions.LoopPlanning.pinned(input) { df =>
        df.groupBy().sum("k")
      }.collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(6L))
      assert(input.storageLevel.useMemory,
        "pinned re-root evicted the caller's cache entry on the input frame")
    } finally {
      sp.conf.unset("spark.graft.loop.planning")
      input.unpersist()
    }
  }

  test("soak: repeated pinned loops leave no session-clone residue on the shared context") {
    // VERDICT r13 task 3: `pinned` clones a session per invocation; a
    // long-lived service opting in per daily batch must not accrete
    // clone state. Three observables, ingestTriage-soak style:
    //   1. every clone is GC-collectable once its loop returns (nothing
    //      on the shared context — bus, cache manager, default/active
    //      session — holds a strong ref);
    //   2. the shared listener bus returns to its baseline count (a
    //      clone's ExecutionListenerBus-style registration is weak-ref'd
    //      and self-removes on the first event after collection);
    //   3. persistent-RDD count and the caller's active session are
    //      unchanged.
    val sp = spark
    import sp.implicits._
    val bridge = org.apache.spark.sql.graftbridge.bridge
    sp.conf.set("spark.graft.loop.planning", "pinned")
    try {
      def oneLoop(i: Int): java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession] = {
        var ref: java.lang.ref.WeakReference[org.apache.spark.sql.SparkSession] = null
        val out = graft.functions.LoopPlanning.pinned(Seq(i, i, i + 1).toDF("k")) { df =>
          ref = new java.lang.ref.WeakReference(df.sparkSession)
          df.groupBy("k").count()
        }
        assert(out.count() == 2)
        ref
      }
      oneLoop(0) // settle any lazy one-time wiring before the baseline
      bridge.waitListenerBusEmpty(sp)
      val listenersBefore = bridge.listenerBusCount(sp)
      val rddsBefore = sp.sparkContext.getPersistentRDDs.size
      val refs = (1 to 6).map(oneLoop)
      // clones must be collectable; self-removal of any dead clone's bus
      // registration rides the NEXT event, so pump one query per probe
      var tries = 0
      while ((refs.exists(_.get != null) ||
          bridge.listenerBusCount(sp) > listenersBefore) && tries < 50) {
        System.gc()
        // allocation pressure so a collection still happens where
        // explicit GC is disabled (-XX:+DisableExplicitGC)
        (0 until 8).foreach { _ =>
          val ballast = new Array[Byte](4 << 20); ballast(ballast.length - 1) = 1
        }
        Thread.sleep(100)
        sp.range(1).count() // an event for the bus's dead-listener sweep
        bridge.waitListenerBusEmpty(sp)
        tries += 1
      }
      assert(refs.forall(_.get == null),
        s"${refs.count(_.get != null)} of 6 pinned-loop session clones are still " +
          "strongly reachable after ~50 GC attempts with allocation pressure — " +
          "either something on the shared context pins them, or this JVM never " +
          "ran a full collection (the check is GC-dependent by nature)")
      val listenersAfter = bridge.listenerBusCount(sp)
      assert(listenersAfter <= listenersBefore,
        s"shared listener bus grew $listenersBefore → $listenersAfter across 6 pinned loops")
      // <=, not ==: the soak's GC loop also lets the ContextCleaner
      // reap earlier suites' unreferenced cache entries, so the count
      // can legitimately DROP below baseline; only growth is a leak
      assert(sp.sparkContext.getPersistentRDDs.size <= rddsBefore,
        "pinned loops leaked persisted RDDs")
      assert(org.apache.spark.sql.SparkSession.getActiveSession.exists(_ eq sp),
        "a pinned loop stole the caller thread's active session")
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
