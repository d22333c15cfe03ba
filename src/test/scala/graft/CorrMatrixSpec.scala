package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B96 `op_corr_matrix` — exact-moment Pearson correlation matrix.
  * Pins:
  *
  *  1. independent recomputation at sf0.001: moments accumulated in
  *     BigInt (exact), the same final float formula — values must
  *     match to the rounded digit;
  *  2. bounds and sanity: every r in [-1, 1]; 6 pairs; n = row count;
  *  3. determinism across reruns (exact moments — no accumulation-
  *     order noise by construction);
  *  4. one aggregation pass: a single scan/exchange in the plan, no
  *     per-pair re-read. */
class CorrMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("independent BigInt-moment recomputation at sf0.001") {
    val rows = sources.Tables.lineitem(spark, dir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map { r =>
        (0 to 3).map(i => BigInt(math.round(r.getAs[Number](i).doubleValue * 100)))
      }
    val n = rows.length
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def s(i: Int) = rows.map(_(i)).sum
    def sp(i: Int, j: Int) = rows.map(v => v(i) * v(j)).sum
    val expected = (for { i <- 0 to 3; j <- 0 to 3 if i < j } yield {
      val r = (n.toDouble * sp(i, j).toDouble - s(i).toDouble * s(j).toDouble) /
        math.sqrt((n.toDouble * sp(i, i).toDouble - s(i).toDouble * s(i).toDouble) *
          (n.toDouble * sp(j, j).toDouble - s(j).toDouble * s(j).toDouble))
      ((names(i), names(j)),
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
    }).toMap
    val got = Relational.corrMatrix(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(got.length == 6)
    got.foreach { case (k, (cnt, r)) =>
      assert(cnt == n)
      assert(r == expected(k), s"$k: got $r want ${expected(k)}")
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("zero-variance column yields NULL r, never NaN") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("a", "b")
    val got = api.Graft.correlations(df, Seq("a", "b"), scale = 0).collect()
    assert(got.length == 1 && got(0).isNullAt(3),
      s"constant column must surface as NULL r: ${got(0)}")
  }

  test("deterministic across reruns (exact moments)") {
    val a = Relational.corrMatrix(spark, dir).collect().map(_.toString)
    val b = Relational.corrMatrix(spark, dir).collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("one aggregation pass: a single scan in the plan") {
    val plan = Relational.corrMatrix(spark, dir)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one scan, saw $scans:\n${plan.take(1500)}")
  }
}
