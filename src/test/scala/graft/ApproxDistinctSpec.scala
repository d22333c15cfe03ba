package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B10's HLL++ estimate is approximate, so the REGISTERED query emits
  * the exact count plus the `within_5pct` accuracy contract (making
  * the oracle row value-exact since r3); this spec pins the raw
  * estimate's accuracy directly, per group. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct (rsd 2%) within 5% of exact, per group") {
    val rows = Relational.aggApproxDistinctFull(spark, dir)
      .select("l_returnflag", "approx_parts", "exact_parts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, a, n) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(math.abs(a - n).toDouble / n <= 0.05,
        s"group $k: approx $a vs exact $n exceeds 5% envelope")
    }
  }

  test("registered query reports within_5pct = true on every group") {
    val rows = Relational.aggApproxDistinct(spark, dir).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(3)))
  }
}
