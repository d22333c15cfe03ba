package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ZOrderKey

/** Known answers + engine parity + the clustering property `op_zorder`
  * is graded on. */
class ZOrderKeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("kernel: hand-computed interleaves (x odd bits, y even bits)") {
    assert(ZOrderKey.kernel(0L, 0L) == 0L)
    assert(ZOrderKey.kernel(1L, 0L) == 2L)   // x bit0 -> position 1
    assert(ZOrderKey.kernel(0L, 1L) == 1L)   // y bit0 -> position 0
    assert(ZOrderKey.kernel(3L, 3L) == 15L)  // both low 2 bits -> 0b1111
    assert(ZOrderKey.kernel(0xFFFFL, 0L) == 0xAAAAAAAAL)
    assert(ZOrderKey.kernel(0L, 0xFFFFL) == 0x55555555L)
    // only the LOW 16 bits participate at the default width
    assert(ZOrderKey.kernel(0x10000L, 0L) == 0L)
  }

  test("kernel at bits=32: the production width covers the full 64-bit curve") {
    // 32 ones in x -> all odd positions of a 64-bit word = 0xAAAA...AA
    assert(ZOrderKey.kernel(0xFFFFFFFFL, 0L, 32) == 0xAAAAAAAAAAAAAAAAL)
    assert(ZOrderKey.kernel(0L, 0xFFFFFFFFL, 32) == 0x5555555555555555L)
    // bit 16 participates at width 32 (it did not at width 16)
    assert(ZOrderKey.kernel(0x10000L, 0L, 32) == (1L << 33))
    // expression + oracle-SQL parity at the production width
    val sql32 = ZOrderKey.sql("x", "y", bits = 32)
    val rows = spark.range(64)
      .selectExpr("(id * 67108879) % 4294967296 AS x", "(id * 2654435761) % 4294967296 AS y")
      .select(col("x"), col("y"),
        ZOrderKey.zorder(col("x"), col("y"), bits = 32).as("z"))
      .selectExpr("x", "y", "z", s"$sql32 AS zsql")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrderKey.kernel(r.getLong(0), r.getLong(1), 32))
      assert(r.getLong(3) == r.getLong(2))
    }
  }

  test("expression matches the local kernel over a codegen'd range") {
    // spark.range-derived inputs so constant folding can't bypass codegen
    val rows = spark.range(256)
      .selectExpr("id % 16 AS x", "id DIV 16 AS y")
      .select(col("x"), col("y"), ZOrderKey.zorder(col("x"), col("y")).as("z"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrderKey.kernel(r.getLong(0), r.getLong(1)))
    }
  }

  test("ZOrderKey.sql (the DuckDB oracle fragment) agrees with the kernel") {
    // the fragment is plain >> & << | integer algebra — Spark SQL can
    // evaluate it too, which pins oracle-vs-engine parity in one engine
    val sql = ZOrderKey.sql("x", "y")
    val rows = spark.range(256)
      .selectExpr("id % 16 AS x", "id DIV 16 AS y")
      .selectExpr("x", "y", s"$sql AS z")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrderKey.kernel(r.getLong(0), r.getLong(1)))
    }
  }

  test("op_zorder: every z-range bounds BOTH dimensions (the pruning property)") {
    // bucket = z >> 10 fixes bits 5..15 of both keys, so within a bucket
    // each dimension spans at most 2^5 - 1 = 31 — the footer-stat
    // tightness that makes per-range min/max pruning effective on either
    // predicate column. Also: stats must cover the whole table.
    val out = Registry.byName("op_zorder").build(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 1, "degenerate layout: a single z-range")
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 31, s"pk span leaks past the bucket: $r")
      assert(r.getLong(5) - r.getLong(4) <= 31, s"sk span leaks past the bucket: $r")
    }
    assert(out.map(_.getLong(1)).sum == 6000L, "bucket stats must cover every row")
  }
}
