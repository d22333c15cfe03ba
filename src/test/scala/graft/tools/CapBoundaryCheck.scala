package graft.tools

/** Cross-engine certification of the hot-bucket caps IN THE TRUNCATING
  * REGIME (r15): every capped structure's oracle carries its cap (B56
  * pattern), but the correctness gate only ever runs where the caps
  * truncate nothing (HotBucketSpec pins that), so the capped-Spark ≡
  * capped-oracle equivalence PAST the boundary had never been executed
  * on both engines. This tool builds the degenerate corpus
  * (HotBucketSpec's construction: N identical docs / identical
  * vectors, so every band bucket, simhash key, and sign bucket holds
  * the whole cluster — far past every cap) and dumps the five
  * cap-affected ops' Spark results; tools/cap_boundary_check.py then
  * runs the same oracle SQL in DuckDB over the same corpus and
  * compares string-exact. A mismatch means the declared-cap semantics
  * desync where they actually bite.
  *
  * Run: `sbt "Test/runMain graft.tools.CapBoundaryCheck"`, then
  * `python3 tools/cap_boundary_check.py`. Result recorded in PLANS.md
  * (r15). */
object CapBoundaryCheck {
  val Dir = "/tmp/capcheck"
  val Out = "/tmp/capcheck_out"
  val Names = Seq("op_dedup_minhash", "op_dedup_cc", "op_dedup_simhash",
    "op_dedup_embedding", "op_dedup_minhash_incremental")

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    // shared construction with HotBucketSpec (DegenerateCorpus): the
    // tool must certify the SAME regime the spec pins, so the corpus
    // has one owner — identical text/vectors, plus the ops' own
    // planted variants forming a second cluster
    graft.DegenerateCorpus.write(spark, Dir)

    // clear prior dumps: the python side derives its op list from the
    // directories here, so a stale dump from an older op set would be
    // silently (mis)certified or crash the oracle lookup
    val outPath = java.nio.file.Paths.get(Out)
    if (java.nio.file.Files.exists(outPath)) {
      val walk = java.nio.file.Files.walk(outPath)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    new java.io.File(Out).mkdirs()
    Names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, Dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$Out/$n")
      println(s"[capcheck] dumped $n")
    }
    println(s"[capcheck] corpus=$Dir results=$Out — now run " +
      "python3 tools/cap_boundary_check.py")
  }
}
