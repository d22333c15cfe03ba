package graft.functions

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative ops, honoring the session's
  * fault-tolerance configuration.
  *
  * `localCheckpoint` blocks live only in executor storage: fast (no
  * distributed-FS write) but NOT fault-tolerant — on a cluster, losing
  * one executor mid-loop aborts the job and restarts the whole
  * computation. That is the right trade locally and at bench SF, and
  * the wrong one for a multi-hour 100 TB pagerank/dedup-cc run, where
  * each superstep should restart from the last RELIABLE cut instead of
  * from zero.
  *
  * Mode (`spark.graft.checkpoint.reliable`, runtime-settable):
  *  - `auto` (default): reliable iff the context has a checkpoint dir
  *    (`sc.setCheckpointDir` — the cluster deployment signal; local
  *    sessions never set one, so the bench keeps localCheckpoint).
  *  - `never`: always localCheckpoint (escape hatch — e.g. a cluster
  *    session whose checkpoint dir serves other jobs).
  *
  * Reliable-mode caveats (Spark's own): checkpoint files accumulate
  * until application end unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, and
  * `eager = false` defers the write to the first action exactly like
  * the local variant. */
object Checkpoints {
  def truncate(df: DataFrame, eager: Boolean = true): DataFrame = {
    val sp = df.sparkSession
    val mode = sp.conf.get("spark.graft.checkpoint.reliable", "auto")
    val reliable = mode match {
      case "never" => false
      case _ => sp.sparkContext.getCheckpointDir.isDefined
    }
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
  }
}
