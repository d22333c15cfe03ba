package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Executed evidence for B70's hot-key story (VERDICT r16 task 4): a
  * boilerplate line that occurs in EVERY document makes the dup
  * join-back's probe side maximally skewed — without mitigation, all
  * its rows shuffle to ONE reducer once the dup set outgrows the
  * broadcast threshold.
  *
  * FINDINGS that shaped the shipped mitigation (r18):
  *  - measured the unmitigated shape: probe-side partition bytes
  *    [0, 209324, 0, 0] on a forced-shuffle 100%-boiler corpus — the
  *    pure hot key;
  *  - AQE's OptimizeSkewedJoin CANNOT rescue this plan: its matcher
  *    needs a shuffle-stage boundary directly under each join side's
  *    sort, and the dup-count aggregation sits between its exchange
  *    and the join (verified: no isSkew split even with
  *    forceOptimizeSkewedJoin=true and a 16k threshold); a same-key
  *    repartition inserted to restore the boundary is eliminated by
  *    the optimizer before planning (verified: no REPARTITION exchange
  *    in the initial physical plan);
  *  - hence B70 ships the PLAN-TIME device instead — B4b's salted
  *    join on (line-key, salt-of-doc_id), dup side exploded
  *    LineSalts× (one row per key — dup-set-sized).
  *
  * This tool now certifies the shipped mitigation: under a
  * forced-shuffle 100%-boiler corpus the probe-side shuffle must
  * spread the hot key across reducers (no partition holds > 60% of
  * the stage's bytes), wall must track volume at 4N, and hash-key ≡
  * string-key verdicts at volume.
  *
  * Run: `sbt "Test/runMain graft.tools.DedupLinesHotKeyProbe [n]"`
  * (default 40000 docs; 4N runs at 160k). */
object DedupLinesHotKeyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(40000)
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the shuffle-join path — the regime where the hot key
      // matters (broadcast of a small dup set is the happy path)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // every doc IS one corpus-wide boiler line: the dup join-back
      // has exactly ONE eligible key — the pure hot-key shape
      def corpus(m: Int) = {
        val boiler = (0 until 10).map(i => s"boiler$i").mkString(" ")
        spark.range(m).select(col("id").as("doc_id"), lit(boiler).as("text"))
      }
      def timed(label: String)(f: => Long): Long = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[dlhot] $label%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$r")
        r
      }
      // warm (codegen)
      Curation.dedupLinesWith(corpus(1000), hashLines = true).count()

      // collect through the frame's OWN QueryExecution so AQE records
      // the final plan and map stats on THIS tree
      val fr = Curation.dedupLinesWith(corpus(n), hashLines = true)
        .select("doc_id", "kept")
      timed(s"hash ${n}")(fr.collect().length.toLong)

      // the mitigation engaged: walk the adaptive final plan's shuffle
      // stages; the probe-side stage (the largest by bytes) must
      // spread the single hot line key across reducers
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
      val stages = scala.collection.mutable.ArrayBuffer[(Int, Seq[Long])]()
      def walk(p: SparkPlan): Unit = {
        p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case s: ShuffleQueryStageExec =>
            s.mapStats.foreach(ms => stages += ((s.id, ms.bytesByPartitionId.toSeq)))
            walk(s.plan)
          case q: QueryStageExec => walk(q.plan)
          case _ =>
        }
        p.children.foreach(walk)
      }
      walk(fr.queryExecution.executedPlan)
      stages.foreach { case (id, sizes) =>
        println(s"[dlhot] stage $id partition bytes: ${sizes.mkString(",")}")
      }
      val (probeId, probeSizes) = stages.maxBy(_._2.sum)
      val spread = probeSizes.max.toDouble / probeSizes.sum.max(1L)
      println(f"[dlhot] probe stage $probeId max-partition share = $spread%.2f " +
        s"(non-empty ${probeSizes.count(_ > 0)}/${probeSizes.size})")
      assert(spread < 0.6,
        f"hot key not spread: one partition holds $spread%.2f of the probe " +
          "stage — the salted join-back is not doing its job")
      val plan = fr.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        "forced-shuffle probe must plan a sort-merge join")

      timed(s"hash ${4 * n}")(
        Curation.dedupLinesWith(corpus(4 * n), hashLines = true).count())
      timed(s"string ${n}")(
        Curation.dedupLinesWith(corpus(n), hashLines = false).count())

      // verdict parity at volume
      val h = Curation.dedupLinesWith(corpus(n), hashLines = true)
        .select("doc_id", "n_lines", "n_dup", "kept")
      val s = Curation.dedupLinesWith(corpus(n), hashLines = false)
        .select("doc_id", "n_lines", "n_dup", "kept")
      val diff = h.exceptAll(s).count() + s.exceptAll(h).count()
      println(s"[dlhot] hash-vs-string verdict diff rows: $diff")
      assert(diff == 0, "hash and string keys disagreed at volume")
      println("[dlhot] OK")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
