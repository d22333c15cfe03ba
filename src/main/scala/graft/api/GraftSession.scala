package graft.api

import org.apache.spark.sql.SparkSession

/** One-call session setup for the library: a user of the reference
  * switching to this engine gets every graft_* SQL function plus the
  * engine's recommended scale configuration without knowing the
  * individual knobs.
  *
  * {{{
  * val spark = GraftSession.builder("local[8]").getOrCreate()
  * spark.sql("SELECT graft_convert(text) FROM docs")
  * }}}
  */
object GraftSession {

  /** The conf the engine recommends (each choice is measured or
    * load-bearing, not folklore):
    *
    *  - `shuffle.partitions` — sized to the parallelism at hand, not
    *    Spark's legacy 200: tiny partitions pay scheduling overhead,
    *    huge ones spill. On a cluster pass total executor cores (or
    *    rely on AQE coalescing from a higher initial value).
    *  - AQE stays ON (default) — a controlled bench run with it off
    *    was slower (PLANS.md); its skew-join split is also the runtime
    *    half of the skew story (`operators.Skew.saltedJoin` is the
    *    plan-time half).
    *  - `maxPartitionBytes` stays at the 128 MB default — with
    *    ~2–4× that in executor memory per task it neither starves
    *    parallelism nor spills; revisit only with very wide rows.
    *  - session timezone pinned UTC so timestamp formatting is
    *    environment-independent.
    *  - nanos-as-long parquet conf — required before any `events`
    *    scan (TIMESTAMP(NANOS) parquet; see `sources.Tables.events`).
    */
  def recommendedConf(cores: Int): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> cores.toString,
    "spark.sql.session.timeZone" -> "UTC",
    graft.sources.Tables.eventsConf)

  private val LocalN = """local\[(\d+)(?:,\d+)?\]""".r

  /** Task-slot count implied by `master`, unless `cores` overrides:
    * `local[8]` → 8, bare `local` → 1 (Spark gives it ONE slot; the
    * host's processor count would mis-size shuffle partitions against
    * it), `local[*]` → the host's processors (which IS its slot
    * count), and the host's processors otherwise (cluster masters,
    * where the caller should pass total executor cores). */
  def resolveCores(master: String, cores: Int = 0): Int =
    if (cores > 0) cores
    else master match {
      case LocalN(n) => n.toInt
      case "local" => 1
      case _ => Runtime.getRuntime.availableProcessors() // local[*], clusters
    }

  /** A builder with the recommended conf ([[resolveCores]]-sized) and
    * the graft extensions (SQL-registered kernels) applied. */
  def builder(master: String, cores: Int = 0): SparkSession.Builder = {
    val resolved = resolveCores(master, cores)
    val b = SparkSession.builder().master(master)
      .withExtensions(new graft.plans.GraftExtensions)
    recommendedConf(resolved).foldLeft(b) { case (acc, (k, v)) => acc.config(k, v) }
  }

  /** Retrofit an EXISTING session: register the graft_* SQL functions
    * (extensions only apply at session build) AND apply the
    * runtime-settable recommended conf — in particular the nanos
    * parquet conf, without which `events`-style TIMESTAMP(NANOS) scans
    * throw. (shuffle.partitions is left alone: resizing a live
    * session's shuffles is the caller's call.) */
  def register(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(graft.sources.Tables.eventsConf._1, graft.sources.Tables.eventsConf._2)
    graft.plans.GraftExtensions.functions.foreach(
      org.apache.spark.sql.graftbridge.bridge.registerFunction(spark, _))
  }
}
