package graft.tools
import graft.SparkTestSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** r21 sweep: for EVERY registered graded query, count how many parquet
  * scans of each base table the executed plan will actually RUN — the
  * traversal stops at InMemoryTableScan (a cached frame computes its
  * build subtree once however many consumers read it) and descends
  * into subqueries. A table scanned 3+ times in one plan usually means
  * a subtree is recomputed per consumer (self-join without exchange
  * reuse, unpersisted shared frame) — the op_graph_pagerank /
  * op_fuzzy_join class of waste this round fixed. NOTE: exchange reuse
  * (ReusedExchange) is applied at execution, so identical-subtree
  * duplicates under one exchange may still dedup at runtime; treat the
  * count as a lead, then read the plan.
  *
  * Run: `sbt "Test/runMain graft.tools.ScanCount [sfDir] [minCount]"`.
  */
object ScanCount {
  private def scans(p: SparkPlan): Seq[String] = {
    val here = p match {
      case _: InMemoryTableScanExec => return Seq.empty // computes once
      case a: AdaptiveSparkPlanExec => return scans(a.inputPlan)
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.headOption
          .map(_.getName.stripSuffix(".parquet")).toSeq
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(scans) ++
      p.subqueries.flatMap(scans)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val min = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkTestSession.spark
    val rows = graft.Registry.all.flatMap { q =>
      try {
        val counts = scans(q.build(spark, sfDir).queryExecution.executedPlan)
          .groupBy(identity).map { case (t, xs) => t -> xs.size }
        val worst = if (counts.isEmpty) 0 else counts.values.max
        Some((worst, q.name, counts.toSeq.sortBy(-_._2)))
      } catch { case e: Throwable =>
        System.err.println(s"[scancount] ${q.name} failed: ${e.getMessage}")
        None
      }
    }
    rows.sortBy(-_._1).takeWhile(_._1 >= min).foreach { case (w, n, cs) =>
      println(f"[scancount] $n%-34s max=$w  ${cs.map { case (t, c) => s"$t:$c" }.mkString(" ")}")
    }
    println("[scancount] done")
    spark.stop()
  }
}
