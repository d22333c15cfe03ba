package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Mining

/** B95 `op_stats_benford` — first-digit conformance screen. Pins:
  *
  *  1. a known Benford-conforming sequence (powers of 2 — the
  *     classic equidistribution example) passes with small deviation;
  *  2. a uniform distribution (TPC-H-like) deviates loudly on
  *     digit 1 — the screen actually screens;
  *  3. graded output invariants: all 9 digits, counts sum to the
  *     filtered row count, shares sum to ~1, benford column matches
  *     the closed form;
  *  4. sub-1 values drop (their leading digit is scale-dependent). */
class BenfordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("Fibonacci conforms; uniforms deviate") {
    import spark.implicits._
    // the classic Benford-conforming integer sequence that fits int64
    val fibs = Iterator.iterate((1L, 1L)) { case (a, b) => (b, a + b) }
      .map(_._1).take(90).toSeq
    val conforming = api.Graft.benfordScreen(fibs.map(Tuple1(_)).toDF("v"), "v")
      .agg(max(abs(col("dev")))).head().getDouble(0)
    assert(conforming < 0.03, s"Fibonacci must conform, max|dev| = $conforming")
    val uniform = (1000 to 9999).map(v => Tuple1(v.toDouble)).toDF("v")
    val devs = api.Graft.benfordScreen(uniform, "v")
      .collect().map(r => (r.getInt(0), r.getDouble(4))).toMap
    assert(math.abs(devs(1)) > 0.15,
      s"uniform 4-digit data must deviate on digit 1: ${devs(1)}")
  }

  test("graded output invariants on orders") {
    val out = Mining.statsBenford(spark, dir).collect()
    assert(out.map(_.getInt(0)).toSeq == (1 to 9))
    val total = sources.Tables.orders(spark, dir)
      .filter(col("o_totalprice") >= 1).count()
    assert(out.map(_.getLong(1)).sum == total)
    val shareSum = out.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    out.foreach { r =>
      val d = r.getInt(0)
      val bf = BigDecimal(math.log10(1.0 + 1.0 / d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == bf, s"benford($d) = ${r.getDouble(3)} want $bf")
    }
  }

  test("sub-1 values drop; all 9 digits always report (zero-mass rows included)") {
    import spark.implicits._
    val vs = Seq(0.5, 0.0, -3.0, 1.0, 25.0).map(Tuple1(_)).toDF("v")
    val out = api.Graft.benfordScreen(vs, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(4))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (1 to 9), "the digit spine must be complete")
    assert(out.map(_._2).sum == 2L)
    assert(out.filter(d => d._1 == 1 || d._1 == 2).forall(_._2 == 1L))
    // a zero-mass digit's deviation is -benford — the loudest signal
    val d9 = out.find(_._1 == 9).get
    assert(d9._2 == 0L && d9._3 < 0.0)
  }
}
