package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** B80 `op_stats_heaps` — known-answer fits on hand corpora where the
  * law's exponent is exact: linear vocabulary growth (every doc
  * introduces only new types) must fit β = 1 with ln K = 0, a
  * saturated vocabulary must fit β = 0 with ln K = ln |V|, and the
  * graded corpus (31-type synthetic vocabulary — saturation) must
  * report β = 0. Totals and point counts are integers and checked
  * exactly. */
class HeapsLawSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(n: Int)(text: Long => String) = {
    import spark.implicits._
    (0L until n.toLong).map(i => (i, text(i))).toDF("doc_id", "text")
  }

  private def fit(df: org.apache.spark.sql.DataFrame, span: Int) =
    Curation.statsHeapsWith(df, span).collect().head

  test("linear growth: beta = 1, lnk = 0 (every doc adds only new types)") {
    val c = corpus(64)(i => s"w${i}a w${i}b w${i}c w${i}d")
    val r = fit(c, span = 4)
    assert(r.getLong(0) == 64 && r.getLong(1) == 256 && r.getLong(2) == 256)
    // buckets 0..15 -> power-of-two points at b = 0, 1, 3, 7, 15
    assert(r.getInt(3) == 5)
    assert(r.getDouble(4) == 1.0, s"beta ${r.getDouble(4)}")
    assert(r.getDouble(5) == 0.0, s"lnk ${r.getDouble(5)}")
  }

  test("saturated vocabulary: beta = 0, lnk = ln|V| (boilerplate extreme)") {
    val c = corpus(64)(_ => "a b a b")
    val r = fit(c, span = 4)
    assert(r.getLong(2) == 2)
    assert(r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == math.BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("graded corpus saturates (31 synthetic types): beta = 0") {
    val r = Curation.statsHeaps(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(2) == 31 && r.getDouble(4) == 0.0)
  }

  test("sub-linear growth lands strictly between the extremes") {
    // types arrive at sqrt pace: doc i contributes type "t<isqrt(i)>"
    // plus filler tokens — beta must be in (0, 1)
    val c = corpus(128)(i =>
      s"t${math.sqrt(i.toDouble).toInt} x y z")
    val r = fit(c, span = 4)
    val beta = r.getDouble(4)
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
  }

  test("single prefix point does not throw (domain edge, fit undefined)") {
    val c = corpus(3)(i => s"a$i b$i")
    val r = fit(c, span = 4) // one bucket -> one point -> 0/0 fit
    assert(r.getInt(3) == 1)
    assert(r.isNullAt(4), "undefined fit must report NULL beta")
  }
}
