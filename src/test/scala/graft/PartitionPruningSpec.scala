package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruning evidence: a `partitionBy("lang")` parquet sink
  * read back with a `lang` predicate must prune at PLANNING time
  * (`PartitionFilters` on the scan, non-matching directories never
  * listed into the scan) — the third pruning class next to
  * `PushedFilters` (row groups) and `ReadSchema` (columns) that a
  * 100 TB layout leans on. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val out: String = {
    val d = java.nio.file.Files.createTempDirectory("partdocs").toString
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").partitionBy("lang").parquet(s"$d/documents")
    d
  }

  test("lang predicate becomes a PartitionFilter, not a data filter") {
    val df = spark.read.parquet(s"$out/documents").filter(col("lang") === "en")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"lang filter did not reach PartitionFilters:\n$p")
    assert(df.count() > 0)
  }

  test("pruned scan reads only the matching partition's files") {
    val all = spark.read.parquet(s"$out/documents")
    val en = all.filter(col("lang") === "en")
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      scans.map(_.selectedPartitions.totalNumberOfFiles).sum
    }
    val fAll = filesRead(all)
    val fEn = filesRead(en)
    assert(fEn < fAll, s"pruning read $fEn of $fAll files — nothing pruned")
    // and the row counts agree with an unpartitioned filter
    val expected = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === "en").count()
    assert(en.count() === expected)
  }
}
