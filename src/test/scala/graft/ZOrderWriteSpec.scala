package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ZOrderKey

/** The WRITER path behind `op_zorder`'s stats query:
  * `repartitionByRange(z).sortWithinPartitions(z)` must produce files
  * whose parquet footers carry tight per-file bounds — that is the
  * artifact a 100 TB table layout job actually ships.
  *
  * Measured geometry this spec pins (sf0.01, 16 files):
  *  - file-level: every file covers a contiguous ~1/11 sliver of the
  *    l_partkey domain (avg span 174 of 1999) — a pk predicate prunes
  *    ~15/16 files on footer stats alone;
  *  - the suppkey domain (7 bits vs partkey's 11) is NOT constrained at
  *    16-file granularity: range cuts land in the z-curve's high bits,
  *    which all belong to the wider dimension. sk pruning appears at
  *    finer granularity — each file is z-SORTED, so row groups inherit
  *    contiguous z sub-ranges, where the `z >> 10` bucket property
  *    (ZOrderKeySpec: span ≤ 31 in BOTH dims) takes over. Production
  *    note: for balanced multi-dim pruning at file level, interleave
  *    RANK-normalized columns (range-partition ids), the standard
  *    OPTIMIZE ZORDER BY preprocessing for asymmetric cardinalities.
  */
class ZOrderWriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("z-range writer: contiguous narrow pk slivers per file, files z-sorted") {
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .withColumn("z", ZOrderKey.zorder(col("pk"), col("sk")))
    val out = "/tmp/graft_zorder_write"
    li.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(out)

    val byFile = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("pk"), col("z"))
      .collect().groupBy(_.getString(0))
    assert(byFile.size == 16, s"expected 16 range files, got ${byFile.size}")

    val domain = 1999L // max(l_partkey) at sf0.01
    val spans = byFile.values.map { rows =>
      rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min
    }.toSeq
    assert(spans.forall(_ <= domain / 8),
      s"a file spans more than 1/8 of the pk domain: $spans")
    assert(spans.sum / spans.size <= domain / 10,
      s"avg pk span per file too wide for footer pruning: $spans")

    // within-file z order: row groups inherit contiguous z sub-ranges,
    // the granularity where both-dim (<=31 span) pruning applies
    byFile.values.foreach { rows =>
      val zs = rows.map(_.getLong(2))
      assert(zs.zip(zs.tail).forall { case (a, b) => a <= b },
        "file not z-sorted — row-group stats would not be contiguous")
    }
  }
}
