package graft

/** Scratch point-measure for a single query at a given SF (dev only). */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3).toInt
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // dev-only A/B hook: SPARK_GRAFT_SCRATCH_CONF="k=v;k=v" overlays
    // session conf (e.g. spark.sql.adaptive.enabled=false)
    val extra = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_CONF", "")
      .split(";").toSeq.filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val spark = extra.foldLeft(
        api.GraftSession.builder(s"local[$cpus]", cpus)
          .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sources.Tables.all.filterNot(_ == "events").foreach { t =>
      try sources.Tables(spark, dir, t).cache().count()
      catch { case _: Throwable => () }
    }
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
