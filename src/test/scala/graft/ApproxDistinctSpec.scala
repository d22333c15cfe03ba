package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** B10 has no value-exact oracle by design (HLL++ is approximate); this
  * pins its accuracy contract instead: within HLL++'s default relative
  * standard deviation bounds of the exact distinct counts, per group. */
class ApproxDistinctSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 3x default rsd (5%) of exact, per group") {
    val approx = Relational.aggApproxDistinct(spark, dir)
      .select("l_returnflag", "approx_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, dir)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n <= 0.15,
        s"group $k: approx $a vs exact $n exceeds 15% envelope")
    }
  }
}
