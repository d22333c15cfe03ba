package graft.functions

import org.apache.spark.sql.SparkSession

/** Planning-mode switch for the iterative superstep loops (pagerank,
  * dedup-cc).
  *
  * Two modes, both defensible: AQE (`adaptive`) materializes every
  * shuffle stage as its own job and re-optimizes at each boundary —
  * runtime coalescing plus the skew-join split, at the cost of 2-3
  * stage jobs per superstep; `pinned` scopes
  * `spark.sql.adaptive.enabled=false` to the loop body on the theory
  * that the loop's per-iteration plan shape is FIXED (the same two
  * exchanges every superstep — PlanEvidenceSpec pins it) so each extra
  * stage job is pure scheduling overhead.
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
  * Scope caveat for `pinned`: the pin is a session-conf toggle, so it
  * is scoped in TIME (set before the loop's actions, restored after),
  * not by thread — an unrelated query another thread plans while a
  * pinned loop runs is planned with AQE off. `pinned` is therefore a
  * single-tenant knob (bench boxes, dedicated jobs); the adaptive
  * default never touches the conf. Concurrent pinned loops in one
  * session are serialized by a JVM-wide lock so the save/restore pairs
  * cannot interleave and strand the session with AQE disabled. Both
  * loops run their supersteps inside the op function (pagerank's eager
  * final checkpoint, dedup-cc's per-superstep convergence probe), so
  * the window covers exactly the iteration jobs; the frames they
  * RETURN read checkpointed blocks and execute later under the
  * caller's conf.
  *
  * Escape hatch (`spark.graft.loop.planning`, runtime-settable):
  * `adaptive` (default) | `pinned` — a quiet single-box run with no
  * skew may claw back the stage-job overhead with `pinned`. Validated
  * fail-fast, like `spark.graft.checkpoint.reliable`: a typo must not
  * silently change the execution mode. */
object LoopPlanning {
  // serializes pinned sections: overlapping save/restore pairs from two
  // loops would otherwise race (A saves true, B saves A's false, A
  // restores true, B restores false) and strand the session AQE-off
  private val pinLock = new Object

  def pinned[T](sp: SparkSession)(body: => T): T =
    sp.conf.get("spark.graft.loop.planning", "adaptive") match {
      case "adaptive" => body
      case "pinned" => pinLock.synchronized {
        val key = "spark.sql.adaptive.enabled"
        val saved = sp.conf.get(key, "true")
        sp.conf.set(key, "false")
        try body
        finally sp.conf.set(key, saved)
      }
      case other =>
        sys.error(s"spark.graft.loop.planning must be 'pinned' or 'adaptive', got '$other'")
    }
}
