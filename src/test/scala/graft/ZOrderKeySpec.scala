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

  test("rank normalization fixes the asymmetric-cardinality failure mode at 32-bit width") {
    // Skewed pair: x spans the full 32-bit space, y has 16 distinct
    // values. RAW interleave at bits=32 puts all of y's variation in
    // the low 8 z-bits, so every coarse z-range cut is an x-only cut:
    // y's min/max stats are table-wide in every range — pruning on y is
    // dead. Rank-normalizing both dims first restores the guarantee.
    val df = spark.range(4096).selectExpr(
      "(id * 2654435761) % 4294967296 AS x", "id % 16 AS y")
    val raw = df
      .select(col("y"), ZOrderKey.zorder(col("x"), col("y"), bits = 32).as("z"))
      .groupBy(shiftright(col("z"), 58).as("zb"))
      .agg(min("y").as("lo"), max("y").as("hi"))
      .collect()
    assert(raw.length > 1)
    raw.foreach(r => assert(r.getLong(1) == 0L && r.getLong(2) == 15L,
      s"expected y unconstrained in every raw coarse range, got $r"))

    // rank-normalized: zbucket = z >> 6 fixes all but 3 low bits per
    // dim, so each dim's RANK span is <= 7 in every bucket — structural
    // (a property of the interleave), not distribution luck.
    val zr = ZOrderKey.rankNormalized(df, "x", "y", rankBits = 8)
    def deinterleave(z: Long, odd: Boolean): Long =
      (0 until 8).map(i => ((z >> (2 * i + (if (odd) 1 else 0))) & 1L) << i).sum
    val ranked = df.select(zr.as("z")).collect().map(_.getLong(0))
    val spans = ranked.groupBy(_ >> 6).values.map { zs =>
      val rx = zs.map(deinterleave(_, odd = true))
      val ry = zs.map(deinterleave(_, odd = false))
      (rx.max - rx.min, ry.max - ry.min)
    }
    assert(spans.nonEmpty)
    spans.foreach { case (sx, sy) =>
      assert(sx <= 7 && sy <= 7, s"rank span leaked past the bucket: x=$sx y=$sy")
    }
  }

  test("QuantileBucket kernel: count of splits <= v, ties deterministic") {
    val s = Array(1.0, 3.0, 7.0)
    assert(graft.plans.QuantileBucket.kernel(0.5, s) == 0L)
    assert(graft.plans.QuantileBucket.kernel(1.0, s) == 1L)  // tie -> upper
    assert(graft.plans.QuantileBucket.kernel(2.9, s) == 1L)
    assert(graft.plans.QuantileBucket.kernel(3.0, s) == 2L)
    assert(graft.plans.QuantileBucket.kernel(100.0, s) == 3L)
  }

  test("op_zorder_ranked: every z-range bounds BOTH rank spans (pruning alive on the narrow dim)") {
    // z >> 4 fixes all but 2 low bits per dim -> rank span <= 3 in every
    // range, structurally — including l_quantity, whose VALUE pruning
    // raw z-order leaves table-wide (the failure mode asserted above).
    val out = Registry.byName("op_zorder_ranked")
      .build(spark, "/root/testdata/sf0.001").collect()
    assert(out.length > 1, "degenerate layout: a single z-range")
    out.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 3, s"pk rank span leaks: $r")
      assert(r.getLong(5) - r.getLong(4) <= 3, s"qty rank span leaks: $r")
    }
    assert(out.map(_.getLong(1)).sum == 6000L, "bucket stats must cover every row")
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
