package graft.functions

import org.apache.spark.sql.SparkSession

/** Planning pin for the iterative superstep loops (pagerank, dedup-cc).
  *
  * AQE materializes every shuffle stage as its own job and re-optimizes
  * at each boundary. That is the right trade for one-shot queries with
  * unknown sizes, and the wrong one inside a superstep loop: the loop's
  * per-iteration plan shape is FIXED (the same two exchanges every
  * superstep — PlanEvidenceSpec pins it), the partitioning is chosen
  * up front (edge cache co-partitioned on the join key, shuffle
  * partitions sized to cores by GraftSession), and there is no skew
  * decision left for runtime stats to improve. Each extra stage job is
  * pure overhead — a driver re-plan plus one more scheduling barrier,
  * i.e. one more chance for a transient load spike to straggle the
  * whole superstep (an n-iteration loop runs 2-3n stage jobs under AQE
  * vs. 1-2 jobs pinned; BENCH_NOISE.md r11 measured multi-minute
  * contention waves on the bench box, and job boundaries are where
  * they bite).
  *
  * SCOPED, not global: only actions executed inside `body` see the
  * pin — the session's other queries keep AQE (its coalescing and
  * skew-join split are load-bearing elsewhere; a controlled global
  * AQE-off bench was SLOWER, PLANS.md). Both loops run their
  * supersteps inside the op function (pagerank's eager final
  * checkpoint, dedup-cc's per-superstep convergence probe), so the
  * scope covers exactly the iteration jobs; the frames they RETURN
  * read checkpointed blocks and execute later under the caller's
  * unpinned conf.
  *
  * Escape hatch (`spark.graft.loop.planning`, runtime-settable):
  * `pinned` (default) | `adaptive` — a cluster whose loop keys are
  * badly skewed may want AQE's skew-join split back inside the loop
  * (the salting escape in `operators.Skew` is the plan-time
  * alternative). Validated fail-fast, like
  * `spark.graft.checkpoint.reliable`: a typo must not silently change
  * the execution mode. */
object LoopPlanning {
  def pinned[T](sp: SparkSession)(body: => T): T =
    sp.conf.get("spark.graft.loop.planning", "pinned") match {
      case "adaptive" => body
      case "pinned" =>
        val key = "spark.sql.adaptive.enabled"
        val saved = sp.conf.get(key, "true")
        sp.conf.set(key, "false")
        try body
        finally sp.conf.set(key, saved)
      case other =>
        sys.error(s"spark.graft.loop.planning must be 'pinned' or 'adaptive', got '$other'")
    }
}
