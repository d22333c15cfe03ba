package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B102 `op_skew_report` — join-key skew diagnostics. Pins:
  *
  *  1. structural invariants on lineitem: one row per key column,
  *     Σ-consistency (n_rows identical across columns), max ≥ p99 ≥
  *     p50 ≥ 1, share_top = max_n/n_rows;
  *  2. the verdict rule on hand data: a planted hot key flips
  *     `skewed` exactly when max > 10× mean, and top_key breaks
  *     count ties to the lowest id;
  *  3. one pass: a single lineitem scan feeds all three columns. */
class SkewReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("structural invariants on lineitem") {
    val out = Relational.skewReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getBoolean(8)))
    assert(out.map(_._1).toSeq == Seq("l_orderkey", "l_partkey", "l_suppkey"))
    assert(out.map(_._2).distinct.length == 1, "all columns see the same row count")
    out.foreach { r =>
      assert(r._4 >= r._7 - 1e-9 && r._7 >= r._6 - 1e-9 && r._6 >= 1.0, s"max>=p99>=p50>=1: $r")
      assert(math.abs(r._8 - BigDecimal(r._4.toDouble / r._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      assert(r._3 <= r._2)
    }
  }

  test("verdict rule + lowest-id tie-break on hand data") {
    import spark.implicits._
    // hot-but-not-skewed: keys 0 and 5 tie at 30 rows (top_key -> 0),
    // 8 singletons; max=30, mean=6.8 -> 30 < 10x mean: NOT skewed
    val hot = Seq.fill(30)(0L) ++ Seq.fill(30)(5L) ++ (1L to 9L).filterNot(_ == 5L)
    val gotHot = api.Graft.skewReport(hot.toDF("k"), Seq("k")).collect()(0)
    assert(gotHot.getLong(4) == 0L, "count tie must break to the lowest key id")
    assert(!gotHot.getBoolean(8), "30 vs mean 6.8 is under the 10x bar")
    // genuinely skewed: 100 rows on one key + 100 singletons;
    // max=100, mean~2 -> over the 10x bar
    val skewed = Seq.fill(100)(42L) ++ (100L to 199L)
    val gotSkew = api.Graft.skewReport(skewed.toDF("k"), Seq("k")).collect()(0)
    assert(gotSkew.getLong(3) == 100L && gotSkew.getLong(2) == 101L)
    assert(gotSkew.getBoolean(8), "100 vs mean ~2 must flag")
  }

  test("one pass: a single lineitem scan feeds all three columns") {
    val plan = Relational.skewReport(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"expected one scan:\n${plan.take(1500)}")
  }
}
