package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SimHashSignature

/** The codegen'd SimHash vote kernel must be bit-identical to the
  * transform/aggregate/zip_with fold it replaced (the DuckDB oracle
  * still states the fold's semantics). */
class SimHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def foldSig(hs: org.apache.spark.sql.Column) = {
    def bitsOf(h: org.apache.spark.sql.Column) =
      transform(sequence(lit(1), lit(32)),
        j => when(h.substr(j, lit(1)) >= "8", 1).otherwise(-1))
    concat_ws("", transform(
      aggregate(hs, array_repeat(lit(0), 32),
        (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b)),
      c => when(c > 0, "1").otherwise("0")))
  }

  test("codegen kernel equals the fold on random digest sets, incl. empty") {
    import spark.implicits._
    val df = spark.range(200).toDF("id")
      .withColumn("hs", filter(
        transform(sequence(lit(0), col("id") % 40), i => md5(concat(col("id"), i))),
        h => lit(true)))
      .withColumn("a", SimHashSignature.simhashSig(col("hs")))
      .withColumn("b", foldSig(col("hs")))
    assert(df.filter(not(col("a") === col("b"))).count() == 0)

    val empty = Seq(Seq.empty[String]).toDF("hs")
      .select(SimHashSignature.simhashSig(col("hs")).as("s"),
        foldSig(col("hs")).as("f")).head()
    assert(empty.getString(0) == empty.getString(1))
    assert(empty.getString(0) == "0" * 32)
  }
}
