package graft.functions

import org.apache.spark.sql.DataFrame

/** Planning-mode switch for the iterative superstep loops (pagerank,
  * dedup-cc).
  *
  * Two modes, both defensible: AQE (`adaptive`) materializes every
  * shuffle stage as its own job and re-optimizes at each boundary —
  * runtime coalescing plus the skew-join split, at the cost of 2-3
  * stage jobs per superstep; `pinned` runs the loop with
  * `spark.sql.adaptive.enabled=false` on the theory that the loop's
  * per-iteration plan shape is FIXED (the same two exchanges every
  * superstep — PlanEvidenceSpec pins it) so each extra stage job is
  * pure scheduling overhead.
  *
  * The DEFAULT is `adaptive`, decided empirically and re-decided when
  * the evidence moved: on the r11 data drop an interleaved per-rep A/B
  * (LoopAbProbe) favored pinned (pagerank best 2.36 s vs 2.67 s); on
  * the r12 drop the same probe reversed it (pagerank pinned best
  * 2.71 s / med 3.05 vs adaptive 2.34 / 2.55; dedup-cc a statistical
  * wash at 1.83 vs 1.85), agreeing with the r11 quiet-window
  * ScratchTiming study (AQE on 2.4 s vs off 3.3 s). When the arms
  * disagree across data drops and the quiet study, the tie-break is
  * the cluster story: at 100 TB the loop keys CAN skew and AQE's
  * runtime re-plan is the only skew defense inside the loop (the
  * salting escape in `operators.Skew` is plan-time, per-op).
  *
  * Scoping (r13, VERDICT r12 task 2): `pinned` no longer toggles the
  * CALLER's session conf inside a time window — it re-roots the
  * loop's input frame onto a CLONED session (same SparkContext, same
  * shared cache manager, copied session state) whose conf carries the
  * pin, so a concurrent query another thread plans on the caller's
  * session keeps AQE no matter what the loop is doing, and the old
  * JVM-wide save/restore lock is gone (each loop owns its clone; the
  * clone is garbage once the loop's frames are). Re-rooting rides
  * `graftbridge.reroot` (a new Dataset over the same analyzed plan —
  * NOT a transient temp view, whose dropTempView would un-cache a
  * caller-cached input through the shared cache manager), and the
  * body's RESULT is re-rooted back onto the caller's session, so the
  * pin covers exactly the jobs the body itself runs (the supersteps:
  * pagerank's eager final checkpoint, dedup-cc's per-superstep
  * convergence probe) while everything the caller executes later —
  * including dedup-cc's post-loop component-size join — plans under
  * the caller's conf, AQE and all.
  *
  * Escape hatch (`spark.graft.loop.planning`, runtime-settable):
  * `adaptive` (default) | `pinned` — a quiet single-box run with no
  * skew may claw back the stage-job overhead with `pinned`. Validated
  * fail-fast, like `spark.graft.checkpoint.reliable`: a typo must not
  * silently change the execution mode. */
object LoopPlanning {

  def pinned(input: DataFrame)(body: DataFrame => DataFrame): DataFrame = {
    val sp = input.sparkSession
    sp.conf.get("spark.graft.loop.planning", "adaptive") match {
      case "adaptive" => body(input)
      case "pinned" =>
        val bridge = org.apache.spark.sql.graftbridge.bridge
        val clone = bridge.cloneSession(sp)
        clone.conf.set("spark.sql.adaptive.enabled", "false")
        bridge.reroot(sp, body(bridge.reroot(clone, input)))
      case other =>
        sys.error(s"spark.graft.loop.planning must be 'pinned' or 'adaptive', got '$other'")
    }
  }
}
