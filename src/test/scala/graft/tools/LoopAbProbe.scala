package graft.tools

import graft.api.GraftSession

/** Interleaved A/B for the loop planning pin (BENCH_NOISE.md r11: noise
  * on this box arrives in multi-minute waves, so arms MUST interleave —
  * a one-run-per-arm A/B is meaningless). Alternates
  * `spark.graft.loop.planning` = pinned | adaptive per rep for each
  * named query and reports per-arm bests. Dev-side, test scope:
  * `sbt "Test/runMain graft.tools.LoopAbProbe op_graph_pagerank op_dedup_cc"` */
object LoopAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val repsPerArm = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "6").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args) {
      // warm both arms once (JIT), unrecorded
      for (mode <- Seq("pinned", "adaptive")) {
        spark.conf.set("spark.graft.loop.planning", mode)
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      val times = collection.mutable.Map("pinned" -> List.empty[Double],
        "adaptive" -> List.empty[Double])
      for (r <- 1 to repsPerArm; mode <- Seq("pinned", "adaptive")) {
        spark.conf.set("spark.graft.loop.planning", mode)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        times(mode) = (System.nanoTime() - t0) / 1e9 :: times(mode)
      }
      spark.conf.unset("spark.graft.loop.planning") // back to the default
      def s(xs: List[Double]) = {
        // true median (even n averages the middle pair — the default 6
        // reps/arm would otherwise report the upper-middle sample,
        // biased high by one inter-sample gap on a noisy box)
        val sorted = xs.sorted
        val med =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
        f"best=${xs.min}%.3f med=$med%.3f all=${xs.reverse.map(t => f"$t%.2f").mkString(",")}"
      }
      println(s"==== $name pinned:   ${s(times("pinned"))}")
      println(s"==== $name adaptive: ${s(times("adaptive"))}")
    }
    spark.stop()
  }
}
