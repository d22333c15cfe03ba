package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RollingHash.rollingHash

/** Differential tests for the codegen'd RollingHash expression against
  * an independent array-fold formulation of the same arithmetic, plus
  * edge cases (empty ranges, out-of-range lengths). */
class RollingHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def foldRef(s: String, off: Int, len: Int): Long = {
    val bytes = s.getBytes("UTF-8")
    val start = math.max(0, off - 1)
    val end = math.min(bytes.length, start + len)
    (start until end).foldLeft(0L)((a, i) => (a * 31 + (bytes(i) & 0xff)) % 1000000007L)
  }

  test("expression matches the reference fold on generated ASCII strings") {
    val gen = Gen.listOfN(80, for {
      s <- Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
      off <- Gen.choose(1, math.max(1, s.length + 2))
      len <- Gen.choose(0, s.length + 5)
    } yield (s, off, len))
    val cases = gen.sample.get
    val got = cases.toDF("s", "off", "len")
      .select(rollingHash(col("s"), col("off"), col("len"))).as[Long].collect()
    cases.zip(got).foreach { case ((s, off, len), actual) =>
      assert(actual == foldRef(s, off, len), s"rollingHash('$s', $off, $len)")
    }
  }

  test("whole-string hash via expression equals aggregate-fold column formulation") {
    val df = Seq("hello world", "", "a", "the quick brown fox").toDF("t")
    val viaExpr = df.select(rollingHash(col("t"), lit(1), length(col("t")))).as[Long].collect()
    val viaFold = df.select(
      aggregate(transform(split(col("t"), ""), c => ascii(c).cast("long")),
        lit(0L), (a, c) => (a * 31 + c) % 1000000007L)).as[Long].collect()
    assert(viaExpr.toSeq == viaFold.toSeq)
  }

  test("null and empty-range behavior") {
    val r = Seq(("abc", 1, 0), ("abc", 10, 5)).toDF("s", "o", "l")
      .select(rollingHash(col("s"), col("o"), col("l"))).as[Long].collect()
    assert(r.toSeq == Seq(0L, 0L))
  }
}
